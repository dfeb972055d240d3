"""DreamBooth + LoRA fine-tuning CLI.

Reproduces the flag surface and training behavior of the reference
train_lora_dreambooth.py:23-394 on the TPU stack:

  * DreamBooth instance + class-prior loss (chunk(2) split, prior weight 1.0)
  * LoRA on the UNet (and optionally the text encoder), EMA with warmup,
    gradient accumulation (optax.MultiSteps), gradient checkpointing
    (jax.checkpoint remat)
  * TensorBoard train/test loss scalars, per-epoch checkpoints + resume
  * epochs = ceil(max_train_steps / ceil(len(dl)/grad_accum))
    (reference :228-229)

TPU differences by design: the train step is ONE jitted function over a
("data", "model") mesh (batch dp-sharded, transformer linears tp-sharded);
--use_8bit_adam maps to an 8-bit-state Adam analog via optax; --device is
accepted but the backend is chosen by JAX; --use_flash_attn selects the
Pallas attention kernel.
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="Training Arguments")
    p.add_argument("--device", default="tpu", type=str, help="Accepted for parity; JAX picks the backend")
    p.add_argument("--model_path", default="./weights/model/v1-5-pruned-emaonly.ckpt", help="Model path (.ckpt or diffusers dir)")
    p.add_argument("--tokenizer_dir", default="./weights/tokenizer/", help="Tokenizer dir")
    p.add_argument("--data_dir", default="data/sprites", type=str, help="Data directory")
    p.add_argument("--img_size", default=32, type=int, help="Image size")
    p.add_argument("--batch_size", default=32, type=int, help="Batch size (per DreamBooth half)")
    p.add_argument("--use_ema", action=argparse.BooleanOptionalAction)
    p.add_argument("--save_dir", default="./checkpoints/", help="Directory to save model")
    p.add_argument("--checkpoint_dir", default="./checkpoints/", help="Directory to save checkpoint")
    p.add_argument("--pretrained_path", default=None, help="Resume checkpoint path")
    p.add_argument("--lr", default=1e-6, type=float, help="Learning rate")
    p.add_argument("--max_train_steps", default=1000, type=int)
    p.add_argument("--use_lora", action=argparse.BooleanOptionalAction)
    p.add_argument("--gradient_accumulation_steps", default=1, type=int)
    p.add_argument("--gradient_checkpointing", action=argparse.BooleanOptionalAction)
    p.add_argument("--use_flash_attn", action=argparse.BooleanOptionalAction)
    p.add_argument("--train_text_encoder", action=argparse.BooleanOptionalAction)
    p.add_argument("--use_8bit_adam", action=argparse.BooleanOptionalAction)
    p.add_argument("--seed", default=None, type=int)
    p.add_argument("--num_class_prior_images", default=None, type=int)
    p.add_argument("--sd_version", default="1.5", type=str)
    p.add_argument("--mesh_model_axis", default=1, type=int, help="Tensor-parallel width of the device mesh")
    p.add_argument("--log_dir", default="runs", type=str, help="TensorBoard log dir")
    p.add_argument("--lr_scheduler", default="constant",
                   choices=["constant", "constant_with_warmup", "cosine"],
                   help="LR schedule over the optimizer-update horizon (reference :242-254)")
    p.add_argument("--lr_warmup_steps", default=0, type=int)
    p.add_argument("--profile_dir", default="", type=str,
                   help="Capture an XLA/TPU trace of the first epoch (TensorBoard profile plugin)")
    p.add_argument("--cache_latents", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="Precompute the frozen VAE's per-image (mean, std) moments and the "
                        "frozen text embeddings ONCE and train from the cache. Exact, not an "
                        "approximation: transforms are deterministic (resize-only) and only the "
                        "reparameterization noise varies per step (training.py "
                        "precompute_latent_moments). Text caching is skipped automatically "
                        "under --train_text_encoder. --no-cache_latents restores the "
                        "reference-style re-encode-every-step loop.")
    return p


def load_base(args):
    """Load base params from a single LDM .ckpt or a diffusers dir
    (the fixed version of the reference's broken utils/utils.py:14-21)."""
    import jax.numpy as jnp

    from stable_diffusion_tpu.models import clip as clip_m
    from stable_diffusion_tpu.models import unet as unet_m
    from stable_diffusion_tpu.models import vae as vae_m
    from stable_diffusion_tpu.pipeline import StableDiffusion
    from stable_diffusion_tpu.utils import model_converter as mc

    if os.path.isdir(args.model_path):
        pipe = StableDiffusion.from_pretrained(args.model_path, sd_version=args.sd_version)
        return pipe.params, pipe.unet_config, pipe.text_config, pipe.vae_config
    params = mc.load_ldm_checkpoint(args.model_path, sd_version=args.sd_version)
    if args.sd_version.startswith("1"):
        return params, unet_m.UNetConfig.sd15(), clip_m.CLIPTextConfig.vit_l(), vae_m.VAEConfig()
    return params, unet_m.UNetConfig.sd21(), clip_m.CLIPTextConfig.vit_h(), vae_m.VAEConfig()


def train(args, base_params, ucfg, tcfg, vcfg, tokenizer):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stable_diffusion_tpu import schedulers as S
    from stable_diffusion_tpu import training as T
    from stable_diffusion_tpu.parallel import mesh as pmesh
    from stable_diffusion_tpu.utils import checkpoint as ckpt
    from stable_diffusion_tpu.utils import datasets

    try:
        from torch.utils.tensorboard import SummaryWriter
        writer = SummaryWriter(args.log_dir)
    except Exception:
        writer = None

    # the data axis must divide the DreamBooth batch (2 * batch_size:
    # instance + prior halves); unused devices are left out of the mesh
    avail = len(jax.devices()) // args.mesh_model_axis
    data_axis = math.gcd(2 * args.batch_size, avail)
    mesh = pmesh.make_mesh(
        data=data_axis, model=args.mesh_model_axis,
        devices=jax.devices()[: data_axis * args.mesh_model_axis],
    )
    base_params = {k: pmesh.shard_params(v, mesh) for k, v in base_params.items()}

    train_cfg = T.TrainConfig(
        learning_rate=args.lr,
        rank=128,
        alpha=128.0,
        grad_accum_steps=args.gradient_accumulation_steps,
        use_ema=bool(args.use_ema),
        gradient_checkpointing=bool(args.gradient_checkpointing),
        train_text_encoder=bool(args.train_text_encoder),
        # reference trainer targets attention projections (q/k/v/out)
        # (train_lora_dreambooth.py:325-330)
        lora_targets=("q_proj", "k_proj", "v_proj", "out_proj"),
        lr_schedule=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        lr_total_steps=args.max_train_steps,
        use_8bit_adam=bool(args.use_8bit_adam),
    )
    schedule = S.make_schedule()
    key = jax.random.key(args.seed or 0)
    key, init_key = jax.random.split(key)
    state = T.init_train_state(init_key, base_params, train_cfg)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    start_epoch = 0
    if args.pretrained_path:
        restored = ckpt.load_train_checkpoint(args.pretrained_path, target={"epoch": 0, "state": state})
        state, start_epoch = restored["state"], int(restored["epoch"]) + 1

    impl = "flash" if args.use_flash_attn else "auto"
    step_fn = jax.jit(
        T.make_train_step(
            base_params, ucfg=ucfg, tcfg=tcfg, vcfg=vcfg,
            schedule=schedule, train_cfg=train_cfg, impl=impl,
        )
    )
    eval_fn = jax.jit(
        T.make_eval_step(
            base_params, ucfg=ucfg, tcfg=tcfg, vcfg=vcfg,
            schedule=schedule, train_cfg=train_cfg, impl=impl,
        )
    )

    train_dl, test_dl = datasets.create_dataloaders(
        tokenizer,
        instance_data_dir=os.path.join(args.data_dir, "instance_data"),
        class_data_dir=os.path.join(args.data_dir, "class_prior_data"),
        train_test_split=1.0,
        batch_size=args.batch_size,
        num_workers=0,
        img_size=(args.img_size, args.img_size),
        num_class_prior_images=args.num_class_prior_images,
    )

    updates_per_epoch = math.ceil(len(train_dl) / args.gradient_accumulation_steps)
    epochs = math.ceil(args.max_train_steps / max(updates_per_epoch, 1))
    dsh = lambda x: jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
    )

    def make_batch(batch_np):
        nonlocal key
        key, nk = jax.random.split(key)
        imgs = batch_np["pixel_values"]
        t, noise, vnoise = T.sample_batch_noise(nk, imgs)
        return {
            "images": dsh(imgs),
            "input_ids": dsh(batch_np["input_ids"]),
            "t": dsh(np.asarray(t)),
            "noise": dsh(np.asarray(noise)),
            "vae_noise": dsh(np.asarray(vnoise)),
        }

    # Cached-frozen-encoder mode (exact; see training.py dreambooth_loss):
    # the frozen VAE moments per image and the frozen text embeddings per
    # prompt are constants across steps, so compute them once up front and
    # build batches from the cache — the reference re-encodes every step
    # (train_lora_dreambooth.py:76-88).  RNG consumption per batch is
    # identical to make_batch, so cached and uncached runs with the same
    # seed follow the same noise stream (tests/test_train_cli.py asserts
    # end-state equality).
    if args.cache_latents:
        ds = train_dl.dataset
        t_pre = time.time()
        # lazy per-image accessors: precompute streams micro_batch images at
        # a time, so a 1000-image prior set never sits on the host as one
        # ~3 GB float32 stack
        class _Lazy:
            def __init__(self, get, n):
                self._get, self._n = get, n
            def __len__(self):
                return self._n
            def __getitem__(self, i):
                return self._get(i)

        inst_mean, inst_std = T.precompute_latent_moments(
            base_params["vae"], _Lazy(ds.instance_pixels, ds.num_instance),
            vcfg, impl=impl,
        )
        cls_mean, cls_std = T.precompute_latent_moments(
            base_params["vae"], _Lazy(ds.class_pixels, ds.num_class),
            vcfg, impl=impl,
        )
        ids_pair = tokenizer.pad(
            {"input_ids": [ds._tokenize(ds.instance_prompt), ds._tokenize(ds.class_prompt)]},
            padding="max_length", max_length=77, return_tensors="np",
        )["input_ids"].astype(np.int32)
        emb_pair = None
        if not train_cfg.train_text_encoder:
            emb_pair = T.precompute_text_embedding(
                base_params["text_encoder"], ids_pair, tcfg, impl=impl
            )
        print(
            f"cached frozen encoders: {ds.num_instance}+{ds.num_class} images "
            f"({time.time()-t_pre:.1f}s)", flush=True,
        )

        def make_cached_batch(idx):
            nonlocal key
            key, nk = jax.random.split(key)
            ii = [i % ds.num_instance for i in idx]
            ci = [i % ds.num_class for i in idx]
            mean = np.concatenate([inst_mean[ii], cls_mean[ci]])
            std = np.concatenate([inst_std[ii], cls_std[ci]])
            t, noise, vnoise = T.sample_noise_for_latents(nk, mean.shape)
            b = len(idx)
            batch = {
                "latent_mean": dsh(mean), "latent_std": dsh(std),
                "t": dsh(np.asarray(t)), "noise": dsh(np.asarray(noise)),
                "vae_noise": dsh(np.asarray(vnoise)),
            }
            if emb_pair is None:  # text LoRA training: ids, not embeddings
                batch["input_ids"] = dsh(np.concatenate(
                    [np.repeat(ids_pair[:1], b, 0), np.repeat(ids_pair[1:], b, 0)]))
            else:
                batch["text_emb"] = dsh(np.concatenate(
                    [np.repeat(emb_pair[:1], b, 0), np.repeat(emb_pair[1:], b, 0)]))
            return batch

        def train_batches(dl):
            for idx in dl.iter_indices():
                yield make_cached_batch(idx)
    else:
        def train_batches(dl):
            for batch_np in dl:
                yield make_batch(batch_np)

    from stable_diffusion_tpu.utils.profiling import trace

    # max_train_steps counts OPTIMIZER UPDATES (reference :228-229); with
    # gradient accumulation one update consumes grad_accum mini-batches
    micro_steps = 0
    accum = max(args.gradient_accumulation_steps, 1)
    with mesh, trace(args.profile_dir or None):
        for epoch in range(start_epoch, start_epoch + epochs):
            losses = []
            t0 = time.time()
            for batch in train_batches(train_dl):
                state, metrics = step_fn(state, batch)
                losses.append(float(metrics["loss"]))
                micro_steps += 1
                if micro_steps // accum >= args.max_train_steps:
                    break
            mean_loss = float(np.mean(losses)) if losses else float("nan")

            # test pass (reference test_step + Loss/{train,test} scalars,
            # train_lora_dreambooth.py:129-188, 251-254)
            test_losses = [float(eval_fn(state, b)) for b in train_batches(test_dl)]
            test_loss = float(np.mean(test_losses)) if test_losses else float("nan")

            print(
                f"epoch {epoch}: loss={mean_loss:.4f} test_loss={test_loss:.4f} "
                f"({time.time()-t0:.1f}s)", flush=True,
            )
            if writer:
                writer.add_scalars("Loss", {"train": mean_loss, "test": test_loss}, epoch)
            os.makedirs(args.checkpoint_dir, exist_ok=True)
            path = ckpt.save_train_checkpoint(
                os.path.join(args.checkpoint_dir, f"epoch-{epoch}"),
                {"epoch": epoch, "state": state},
            )
            print(f"saved checkpoint: {path}", flush=True)
            if micro_steps // accum >= args.max_train_steps:
                break
    if writer:
        writer.close()
    return state


def main(argv=None):
    args = build_parser().parse_args(argv)
    from transformers import CLIPTokenizer

    tokenizer = CLIPTokenizer.from_pretrained(args.tokenizer_dir)
    base_params, ucfg, tcfg, vcfg = load_base(args)
    return train(args, base_params, ucfg, tcfg, vcfg, tokenizer)


if __name__ == "__main__":
    main()
