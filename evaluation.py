"""Evaluation harness: COCO-caption sweep + CLIP score (+ optional FID).

Reproduces the reference evaluation.py:34-184: sample N captions from a
COCO-format annotation file, generate images for every config in
{ddpm, ddim} x {linear, cosine} x cfg_scales, save real/fake pairs, and log
CLIP-score per config to TensorBoard.

Upgrades over the reference:
  * CLIP-score actually runs (the reference's torchmetrics computation is
    commented out, evaluation.py:96-107): we score with our native JAX CLIP
    model (vision tower + projections, models/clip.py) loaded from an HF
    CLIPModel safetensors dir passed via --clip_model_dir.  Without it the
    sweep still runs and scores are skipped, matching the reference's
    shipped behavior.
  * FID actually runs too (reference evaluation.py:21-31 is commented out):
    native Frechet distance + feature towers in stable_diffusion_tpu/fid.py.
    --fid_backbone inception needs --inception_weights (a local torchvision/
    pytorch-fid state dict; this container has no egress); --fid_backbone
    clip computes CLIP-FID (arXiv 2203.06026) from --clip_model_dir with no
    extra weights.
"""

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

TEST_CONFIGS = [
    {"sampler": "ddpm", "use_cosine_schedule": False},
    {"sampler": "ddpm", "use_cosine_schedule": True},
    {"sampler": "ddim", "use_cosine_schedule": False},
    {"sampler": "ddim", "use_cosine_schedule": True},
]
CFG_SCALES = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.5, 9.0]


def load_clip_scorer(clip_model_dir: str):
    """HF CLIPModel dir (config.json + model.safetensors) -> jitted scorer."""
    import jax
    import jax.numpy as jnp

    from stable_diffusion_tpu.models import clip as clip_m
    from stable_diffusion_tpu.utils import model_converter as mc
    from stable_diffusion_tpu.utils.torch_interop import from_torch_state_dict

    with open(os.path.join(clip_model_dir, "config.json")) as f:
        cfg = json.load(f)
    tcfg = clip_m.CLIPTextConfig.from_dict(cfg.get("text_config", cfg))
    vcfg = clip_m.CLIPVisionConfig.from_dict(cfg.get("vision_config", cfg))
    flat = mc.read_checkpoint(os.path.join(clip_model_dir, "model.safetensors"))
    # device arrays, not numpy: the scorer closes over these under jit, and a
    # numpy embedding table cannot be indexed by a traced id array
    # (caught by tests/test_eval_quant.py::test_evaluation_cli_main)
    params = jax.tree.map(jnp.asarray, from_torch_state_dict(flat))

    import functools

    @functools.partial(jax.jit, static_argnums=())
    def score(pixel_values, input_ids):
        return clip_m.clip_score(params, pixel_values, input_ids, vcfg, tcfg)

    return score


def generate_fake_imgs(args, model, original_imgs_dir, label_file, save_dir,
                       num_samples, test_configs, cfg_scales, scorer=None,
                       writer_fn=None, feature_fn=None):
    from PIL import Image

    with open(label_file) as f:
        annotation_dict = json.load(f)
    id2filename = {img["id"]: img["file_name"] for img in annotation_dict["images"]}
    prompts_dict = {
        anno["caption"]: {
            "image_id": anno["image_id"],
            "file_name": id2filename[anno["image_id"]],
            "id": anno["id"],
        }
        for anno in annotation_dict["annotations"]
    }
    rng = random.Random(args.seed)
    random_prompts = rng.sample(list(prompts_dict.keys()), k=num_samples)
    os.makedirs(f"{save_dir}/original", exist_ok=True)

    results = {}
    real_feats = None
    for config in test_configs:
        sampler = config["sampler"]
        cosine = config["use_cosine_schedule"]
        writer = writer_fn(sampler, cosine) if writer_fn else None
        for cfg_scale in cfg_scales:
            tag = f"{cfg_scale}_{sampler}_{'cosine' if cosine else 'linear'}Schedule"
            os.makedirs(f"{save_dir}/fake/{tag}", exist_ok=True)
            scores = []
            fake_feats = []
            real_batch = []
            for prompt in random_prompts:
                meta = prompts_dict[prompt]
                pil_img = Image.open(
                    os.path.join(original_imgs_dir, meta["file_name"])
                ).convert("RGB").resize((512, 512))
                fake = model.generate(
                    prompt=prompt,
                    uncond_prompt="",
                    img_size=(512, 512),
                    do_cfg=args.do_cfg,
                    cfg_scale=cfg_scale,
                    strength=args.strength,
                    inference_steps=args.num_inference_steps,
                    sampler=sampler,
                    use_cosine_schedule=cosine,
                    seed=args.seed or 0,
                )[0]
                fake_u8 = (np.clip(fake, 0, 1) * 255).round().astype(np.uint8)
                stem = f"{meta['image_id']}_{meta['id']}"
                pil_img.save(os.path.join(save_dir, "original", f"{stem}.jpg"))
                Image.fromarray(fake_u8).save(os.path.join(save_dir, "fake", tag, f"{stem}.jpg"))
                with open(os.path.join(save_dir, f"{stem}.txt"), "w") as f:
                    f.write(prompt)
                if scorer is not None:
                    ids = model.tokenize([prompt])
                    img224 = np.asarray(
                        Image.fromarray(fake_u8).resize((224, 224), Image.BICUBIC),
                        dtype=np.float32,
                    )[None]
                    scores.append(float(scorer(img224, ids)[0]))
                if feature_fn is not None:
                    fake_feats.append(np.asarray(
                        feature_fn(fake_u8[None].astype(np.float32) / 255.0)
                    ))
                    if real_feats is None:
                        real_batch.append(np.asarray(
                            feature_fn(np.asarray(pil_img, np.float32)[None] / 255.0)
                        ))
            if feature_fn is not None:
                from stable_diffusion_tpu import fid as fid_m

                if real_feats is None:
                    real_feats = np.concatenate(real_batch, axis=0)
                fid_val = fid_m.fid_from_features(
                    real_feats, np.concatenate(fake_feats, axis=0)
                )
                results[f"{tag}/fid"] = fid_val
                print(f"{tag}: FID={fid_val:.4f}", flush=True)
                if writer:
                    writer.add_scalars("FID", {"fid": fid_val}, int(cfg_scale))
            if scores:
                avg = float(np.mean(scores))
                results[tag] = avg
                print(f"{tag}: CLIP-score={avg:.4f}", flush=True)
                if writer:
                    writer.add_scalars("CLIP Score", {"clip_score": avg}, int(cfg_scale))
        if writer:
            writer.close()
    return results


def build_parser():
    parser = argparse.ArgumentParser(description="Evaluation Arguments")
    parser.add_argument("--model_path", help="Model path", metavar="", default="")
    parser.add_argument("--tokenizer_dir", metavar="", default="")
    parser.add_argument("--device", metavar="", default="tpu", type=str)
    parser.add_argument("--lora_ckpt", metavar="", default="", type=str)
    parser.add_argument("--do_cfg", action=argparse.BooleanOptionalAction)
    parser.add_argument("--cfg_scale", metavar="", default=7.5, type=float)
    parser.add_argument("--strength", metavar="", default=1.0, type=float)
    parser.add_argument("--num_inference_steps", default=50, choices=range(1, 1001),
                        metavar="Value: [1-1000]", type=int)
    parser.add_argument("--sampler", metavar="", default="ddpm", choices=["ddpm", "ddim"], type=str)
    parser.add_argument("--use_cosine_schedule", action=argparse.BooleanOptionalAction)
    parser.add_argument("--original_imgs_dir", default="./val2017", type=str)
    parser.add_argument("--label_file", default="./annotations/captions_val2017.json", type=str)
    parser.add_argument("--save_dir", default="./eval_output", type=str)
    parser.add_argument("--num_samples", default=1000, type=int)
    parser.add_argument("--clip_model_dir", default="", type=str,
                        help="HF CLIPModel dir for native CLIP-score (optional)")
    parser.add_argument("--fid_backbone", default="none",
                        choices=["none", "inception", "clip"],
                        help="FID feature tower; 'clip' = CLIP-FID from --clip_model_dir")
    parser.add_argument("--inception_weights", default="", type=str,
                        help="Local torchvision/pytorch-fid InceptionV3 state dict")
    parser.add_argument("--seed", default=None, type=int)
    parser.add_argument("--sd_version", default="1.5", type=str)
    return parser


def main(argv=None):
    from transformers import CLIPTokenizer

    from stable_diffusion_tpu.pipeline import StableDiffusion

    args = build_parser().parse_args(argv)
    args.do_cfg = bool(args.do_cfg) if args.do_cfg is not None else True
    tokenizer = CLIPTokenizer.from_pretrained(args.tokenizer_dir)
    model = StableDiffusion.from_pretrained(
        args.model_path, sd_version=args.sd_version, tokenizer=tokenizer
    )
    scorer = load_clip_scorer(args.clip_model_dir) if args.clip_model_dir else None
    feature_fn = None
    if args.fid_backbone != "none":
        from stable_diffusion_tpu import fid as fid_m

        feature_fn = fid_m.make_feature_fn(
            args.fid_backbone, weights_path=args.inception_weights,
            clip_model_dir=args.clip_model_dir,
        )

    def writer_fn(sampler, cosine):
        try:
            from torch.utils.tensorboard import SummaryWriter

            name = f"{sampler}_{'cosine' if cosine else 'linear'}"
            return SummaryWriter(log_dir=os.path.join("./runs/", name))
        except Exception:
            return None

    return generate_fake_imgs(
        args, model, args.original_imgs_dir, args.label_file, args.save_dir,
        args.num_samples, TEST_CONFIGS, CFG_SCALES, scorer=scorer,
        writer_fn=writer_fn, feature_fn=feature_fn,
    )


if __name__ == "__main__":
    main()
