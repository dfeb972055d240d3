"""txt2img / img2img / one-step inference CLI.

Reproduces the flag surface of the reference inference.py:65-124 (same flag
names, defaults, and semantics), on the TPU pipeline.  Differences by design:
  * ``--device`` is accepted but ignored (JAX targets the TPU/current backend;
    weights are resident, no CPU<->device swapping).
  * Output files are img_{i}_{j}.jpg (batch index included — fixes the
    reference's overwrite bug, SURVEY 2.12.12).
  * LoRA checkpoints merge into the weights at load (zero runtime cost)
    instead of module parametrization.
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def inference(args, model, input_image=None):
    from PIL import Image

    outputs = []
    iterations = math.ceil(args.n_samples / args.batch_size)
    os.makedirs(args.output_dir, exist_ok=True)

    for i in range(iterations):
        if not args.one_step:
            imgs = model.generate(
                prompt=args.prompt,
                uncond_prompt=args.uncond_prompt,
                input_image=input_image,
                img_size=(args.img_size, args.img_size),
                do_cfg=args.do_cfg,
                cfg_scale=args.cfg_scale,
                inference_steps=args.num_inference_steps,
                strength=args.strength,
                sampler=args.sampler,
                use_cosine_schedule=args.use_cosine_schedule,
                seed=(args.seed or 0) + i,
                batch_size=args.batch_size,
                output_dtype="uint8",
            )
        else:
            imgs = model.generate_in_one_step(
                prompt=args.prompt,
                img_size=(args.img_size, args.img_size),
                seed=(args.seed or 0) + i,
                batch_size=args.batch_size,
            )
        for j, img in enumerate(imgs):
            if img.dtype == np.uint8:
                arr = img
            else:
                arr = (np.clip(img, 0.0, 1.0) * 255).round().astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(args.output_dir, f"img_{i}_{j}.jpg"))
            outputs.append(arr)
    return outputs


def build_parser():
    parser = argparse.ArgumentParser(description="Inference Arguments")
    parser.add_argument("--model_path", help="Model path (diffusers layout dir or single LDM .ckpt/.safetensors file)", metavar="", default="")
    parser.add_argument("--tokenizer_dir", metavar="", default="", help="Tokenizer dir")
    parser.add_argument("--device", metavar="", default="tpu", type=str,
                        help="Accepted for reference-CLI parity; JAX picks the backend")
    parser.add_argument("--img_size", metavar="", default=512, type=int, help="Image size")
    parser.add_argument("--img_path", metavar="", default="", type=str, help="Image path")
    parser.add_argument("--prompt", metavar="", default="", type=str, help="Input prompt")
    parser.add_argument("--uncond_prompt", metavar="", default="", type=str, help="Unconditional prompt")
    parser.add_argument("--n_samples", metavar="", default=3, type=int, help="Number of generated images")
    parser.add_argument("--lora_ckpt", metavar="", default="", type=str, help="Option to use lora checkpoint")
    parser.add_argument("--do_cfg", action=argparse.BooleanOptionalAction, help="Activate CFG")
    parser.add_argument("--cfg_scale", metavar="", default=7.5, type=float, help="CFG scale")
    parser.add_argument("--strength", metavar="", default=1.0, type=float, help="img2img strength")
    parser.add_argument("--num_inference_steps", help="Step to generate image", default=50,
                        choices=range(1, 1001), metavar="Value: [1-1000]", type=int)
    parser.add_argument("--sampler", metavar="", default="ddpm", choices=["ddpm", "ddim"], type=str)
    parser.add_argument("--use_cosine_schedule", action=argparse.BooleanOptionalAction)
    parser.add_argument("--batch_size", metavar="", default=1, type=int, help="Batch size")
    parser.add_argument("--seed", default=None, type=int, help="Seed value")
    parser.add_argument("--one_step", action=argparse.BooleanOptionalAction, help="One step generation")
    parser.add_argument("--sd_version", default="1.5", type=str, help="Stable Diffusion Model Version")
    parser.add_argument("--output_dir", default="./output", type=str, help="Where to save images")
    parser.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"], type=str)
    parser.add_argument("--profile_dir", default="", type=str,
                        help="Capture an XLA/TPU trace of generation (TensorBoard profile plugin)")
    return parser


def main(argv=None):
    import jax.numpy as jnp
    from PIL import Image

    from stable_diffusion_tpu.models import lora as lora_m
    from stable_diffusion_tpu.pipeline import StableDiffusion
    from stable_diffusion_tpu.utils import model_converter as mc

    args = build_parser().parse_args(argv)
    args.do_cfg = bool(args.do_cfg)
    args.use_cosine_schedule = bool(args.use_cosine_schedule)
    args.one_step = bool(args.one_step)

    input_image = None
    if args.img_path and os.path.exists(args.img_path):
        input_image = Image.open(args.img_path)

    tokenizer = None
    if args.tokenizer_dir:
        from transformers import CLIPTokenizer

        tokenizer = CLIPTokenizer.from_pretrained(args.tokenizer_dir)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = StableDiffusion.from_pretrained(
        args.model_path, sd_version=args.sd_version, dtype=dtype, tokenizer=tokenizer
    )

    if args.lora_ckpt.endswith(".safetensors"):
        # kohya LoRA: merge into the base weights (reference inference.py:110-117)
        lora = mc.load_lora_kohya(args.lora_ckpt)
        model.params["unet"] = lora_m.merge_lora(model.params["unet"], lora["unet"])
        model.params["text_encoder"] = lora_m.merge_lora(
            model.params["text_encoder"], lora["text_encoder"]
        )
    elif args.lora_ckpt.endswith((".ckpt", ".msgpack", ".orbax")):
        # our own training checkpoints (reference inference.py:118-122)
        from stable_diffusion_tpu.utils import checkpoint as ckpt

        state = ckpt.load_train_checkpoint(args.lora_ckpt)
        model.params["unet"] = lora_m.merge_lora(model.params["unet"], state["lora"]["unet"])
        if "text_encoder" in state["lora"]:
            model.params["text_encoder"] = lora_m.merge_lora(
                model.params["text_encoder"], state["lora"]["text_encoder"]
            )

    from stable_diffusion_tpu.utils.profiling import trace

    with trace(args.profile_dir):
        return inference(args, model, input_image)


if __name__ == "__main__":
    main()
