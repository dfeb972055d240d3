"""TPU-native Stable Diffusion framework (JAX / XLA / Pallas).

A from-scratch re-design of the capabilities of dnnhhuy/stable-diffusion-pytorch
for TPU hardware: pure-functional models over name-preserving parameter pytrees,
NHWC activations / HWIO conv kernels (the TPU-native layouts), samplers as
precomputed-table pure functions compiled into a single jitted ``lax.scan``
denoise loop, Pallas kernels for the hot attention and norm paths, and
``jax.sharding``-based data/tensor parallelism over a device mesh.

Layer map (mirrors SURVEY.md section 1, re-architected for TPU):
  - ``stable_diffusion_tpu.models``     : CLIP/OpenCLIP text towers, UNet, VAE/VQVAE, LoRA, EMA
  - ``stable_diffusion_tpu.schedulers`` : DDPM / DDIM diffusion processes (pure functions)
  - ``stable_diffusion_tpu.ops``        : Pallas TPU kernels + XLA reference paths
  - ``stable_diffusion_tpu.parallel``   : mesh construction + sharding rules (dp x tp)
  - ``stable_diffusion_tpu.utils``      : checkpoint interop (6 formats), datasets, quantization
  - ``stable_diffusion_tpu.pipeline``   : the StableDiffusion orchestration pipeline
"""

__version__ = "0.1.0"

from stable_diffusion_tpu import schedulers  # noqa: F401
