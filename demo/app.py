"""Gradio demo: txt2img / img2img / inpaint tabs.

Reproduces the reference demo (demo/app.py:11-311) on the TPU pipeline —
same three tabs, same controls (prompt, uncond prompt, n_samples slider,
CFG scale / strength / steps / sampler / cosine-schedule accordion), same
gallery outputs.  gr.Progress IS wired to the denoise loop: the pipeline's
``progress_callback`` chunks the fused scan into short dispatches
(pipeline.generate/inpaint progress mode), so the bar advances during
generation like the reference's tqdm loop (demo/models/diffusion.py:55-70).

Differences by design:
  * Loads a diffusers-layout model dir or a single LDM .ckpt via the unified
    converter (the reference demo downloads v1-5-pruned-emaonly.ckpt from
    the hub, demo/app.py:16-31 — this box has no egress, so pass
    --model_path).
  * Optional kohya/our LoRA merges at load (reference demo/app.py:35-39).
  * gradio is an optional dependency: this module imports lazily and gives a
    clear error if absent.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODEL = {"pipe": None}

# Output resolution for all three tabs (the reference demo is fixed 512x512,
# demo/app.py:96).  Module-level so tests can drive the real handlers on a
# tiny model at low resolution.
IMG_SIZE = (512, 512)


def initialize_model(model_path: str, tokenizer_dir: str, sd_version: str = "1.5",
                     lora_ckpt: str = ""):
    import jax.numpy as jnp
    from transformers import CLIPTokenizer

    from stable_diffusion_tpu.models import clip as clip_m
    from stable_diffusion_tpu.models import lora as lora_m
    from stable_diffusion_tpu.models import unet as unet_m
    from stable_diffusion_tpu.models import vae as vae_m
    from stable_diffusion_tpu.pipeline import StableDiffusion
    from stable_diffusion_tpu.utils import model_converter as mc

    tokenizer = CLIPTokenizer.from_pretrained(tokenizer_dir)
    if os.path.isdir(model_path):
        pipe = StableDiffusion.from_pretrained(
            model_path, sd_version=sd_version, dtype=jnp.bfloat16, tokenizer=tokenizer
        )
    else:
        params = mc.load_ldm_checkpoint(model_path, sd_version=sd_version, dtype=np.float32)
        ucfg = unet_m.UNetConfig.sd15() if sd_version.startswith("1") else unet_m.UNetConfig.sd21()
        tcfg = (
            clip_m.CLIPTextConfig.vit_l() if sd_version.startswith("1")
            else clip_m.CLIPTextConfig.vit_h()
        )
        pipe = StableDiffusion(
            params=params, unet_config=ucfg, text_config=tcfg,
            vae_config=vae_m.VAEConfig(), tokenizer=tokenizer,
            dtype=jnp.bfloat16, sd_version=sd_version,
        )
    if lora_ckpt:
        lora = mc.load_lora_kohya(lora_ckpt)
        pipe.params["unet"] = lora_m.merge_lora(pipe.params["unet"], lora["unet"])
        pipe.params["text_encoder"] = lora_m.merge_lora(
            pipe.params["text_encoder"], lora["text_encoder"]
        )
    MODEL["pipe"] = pipe
    return pipe, tokenizer


def _progress_cb(progress):
    """gr.Progress (or None) -> pipeline progress_callback."""
    if progress is None:
        return None
    return lambda done, total: progress(done / total, desc=f"denoising {done}/{total}")


def _to_pil(imgs01):
    from PIL import Image

    return [
        Image.fromarray((np.clip(img, 0, 1) * 255).round().astype(np.uint8)) for img in imgs01
    ]


def txt2img(prompt, uncond_prompt, n_samples, use_cosine, cfg_scale, strength,
            inference_steps, sampler, progress=None):
    pipe = MODEL["pipe"]
    imgs = pipe.generate(
        prompt=prompt, uncond_prompt=uncond_prompt, do_cfg=True,
        cfg_scale=float(cfg_scale), strength=float(strength),
        inference_steps=int(inference_steps), sampler=sampler,
        use_cosine_schedule=bool(use_cosine), batch_size=int(n_samples),
        img_size=IMG_SIZE, progress_callback=_progress_cb(progress),
    )
    return _to_pil(imgs)


def img2img(input_image, prompt, uncond_prompt, n_samples, use_cosine, cfg_scale,
            strength, inference_steps, sampler, progress=None):
    pipe = MODEL["pipe"]
    imgs = pipe.generate(
        prompt=prompt, uncond_prompt=uncond_prompt, input_image=input_image,
        do_cfg=True, cfg_scale=float(cfg_scale), strength=float(strength),
        inference_steps=int(inference_steps), sampler=sampler,
        use_cosine_schedule=bool(use_cosine), batch_size=int(n_samples),
        img_size=IMG_SIZE, progress_callback=_progress_cb(progress),
    )
    return _to_pil(imgs)


def inpaint(input_images, prompt, uncond_prompt, n_samples, use_cosine, cfg_scale,
            strength, inference_steps, sampler, progress=None):
    from PIL import Image

    pipe = MODEL["pipe"]
    # gr.ImageMask delivers {"background": PIL, "layers": [PIL mask]}
    base = input_images["background"]
    layer = input_images["layers"][0] if input_images.get("layers") else None
    mask = (
        layer.split()[-1] if layer is not None else Image.new("L", base.size, 0)
    )
    outs = []
    for i in range(int(n_samples)):
        out = pipe.inpaint(
            prompt=prompt, input_image=base, mask=mask, uncond_prompt=uncond_prompt,
            do_cfg=True, cfg_scale=float(cfg_scale), strength=float(strength),
            inference_steps=int(inference_steps), sampler=sampler,
            use_cosine_schedule=bool(use_cosine), img_size=IMG_SIZE, seed=i,
            progress_callback=_progress_cb(progress),
        )
        outs.append(Image.fromarray(out))
    return outs


def build_demo():
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError("gradio is not installed; `pip install gradio` to run the demo") from e

    sampler_choices = [("DDPM", "ddpm"), ("DDIM", "ddim")]

    def with_progress(fn):
        # gradio injects a live gr.Progress for any param defaulting to one
        def wrapped(*a, progress=gr.Progress()):
            return fn(*a, progress=progress)
        return wrapped

    txt2img_h, img2img_h, inpaint_h = map(with_progress, (txt2img, img2img, inpaint))

    def controls(open_accordion):
        with gr.Accordion(label="Advanced settings", open=open_accordion):
            cfg_scale = gr.Slider(minimum=0, maximum=10, label="CFG Scale", step=0.1, value=7.5)
            strength = gr.Slider(label="Strength", minimum=0, maximum=1.0, step=0.01, value=0.8)
            steps = gr.Slider(label="Generation Steps", minimum=0, maximum=1000, step=1, value=50)
            sampler = gr.Dropdown(label="Sampling method", choices=sampler_choices, value="ddpm")
            cosine = gr.Checkbox(value=False, label="Use cosine-based beta schedule")
        return cfg_scale, strength, steps, sampler, cosine

    demo = gr.Blocks().queue()
    with demo:
        with gr.Row():
            gr.Markdown("## Stable Diffusion (TPU)")
        with gr.Tab(label="txt2img"):
            with gr.Row():
                with gr.Column():
                    prompt = gr.Textbox(label="Prompt")
                    uncond = gr.Textbox(label="Uncondition prompt")
                    n = gr.Slider(label="Number of generated images", minimum=1, maximum=5, step=1, value=1)
                    cfg_s, stren, steps, samp, cos = controls(False)
            with gr.Row():
                btn = gr.Button(value="Generate")
            with gr.Row():
                gallery = gr.Gallery(label="Generated images", show_label=False)
            btn.click(fn=txt2img_h, inputs=[prompt, uncond, n, cos, cfg_s, stren, steps, samp],
                      outputs=[gallery])
        with gr.Tab("img2img"):
            with gr.Row(equal_height=True):
                img_in = gr.Image(sources="upload", type="pil")
                with gr.Column():
                    prompt = gr.Textbox(label="Prompt")
                    uncond = gr.Textbox(label="Uncondition prompt")
                    n = gr.Slider(label="Number of generated images", minimum=1, maximum=5, step=1, value=1)
            with gr.Row():
                cfg_s, stren, steps, samp, cos = controls(True)
            with gr.Row():
                btn = gr.Button(value="Generate")
            with gr.Row():
                gallery = gr.Gallery(label="Generated images", show_label=False)
            btn.click(fn=img2img_h, inputs=[img_in, prompt, uncond, n, cos, cfg_s, stren, steps, samp],
                      outputs=[gallery])
        with gr.Tab("inpaint"):
            with gr.Row():
                img_mask = gr.ImageMask(sources="upload", type="pil", crop_size=(512, 512), scale=2)
                with gr.Column(scale=1):
                    prompt = gr.Textbox(label="Prompt")
                    uncond = gr.Textbox(label="Unconditional prompt")
                    n = gr.Slider(label="Number of generated images", minimum=1, maximum=5, step=1, value=1)
                    cfg_s, stren, steps, samp, cos = controls(False)
            with gr.Row():
                btn = gr.Button(value="Generate")
            with gr.Row():
                gallery = gr.Gallery(label="Generated images", show_label=False)
            btn.click(fn=inpaint_h, inputs=[img_mask, prompt, uncond, n, cos, cfg_s, stren, steps, samp],
                      outputs=[gallery])
    return demo


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--tokenizer_dir", required=True)
    parser.add_argument("--sd_version", default="1.5")
    parser.add_argument("--lora_ckpt", default="")
    args = parser.parse_args()
    initialize_model(args.model_path, args.tokenizer_dir, args.sd_version, args.lora_ckpt)
    build_demo().launch()
