"""Model components: text encoders, UNet, VAE, LoRA, EMA."""

from stable_diffusion_tpu.models import attention, clip, ema, layers, lora, unet, vae  # noqa: F401
