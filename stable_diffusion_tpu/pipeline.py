"""StableDiffusion orchestration pipeline (txt2img / img2img / inpaint /
one-step / training loss).

TPU re-design of the reference pipeline (models/diffusion.py:24-443).  Key
architectural differences from the reference, per SURVEY section 7:

  * Weights are resident on device (sharded over the mesh when given) — the
    reference's per-stage CPU<->accelerator ``.to()`` swapping
    (diffusion.py:190-242) is replaced wholesale.
  * The whole denoise loop is ONE jitted ``lax.scan``: timestep/prev-timestep
    sequences are static-length arrays, schedule values are table gathers,
    and CFG's (uncond, cond) pair is batched into a single UNet call exactly
    like the reference's repeat(2) batching (diffusion.py:227-235).
  * PRNG is explicit ``jax.random`` keys (replaces torch.Generator seeding,
    diffusion.py:178-182).  Parity tests inject fixed noise arrays.
  * One compile per (batch, H, W, steps, do_cfg, sampler) combination;
    cfg_scale and the timestep values are traced, so sweeping guidance or
    strength does NOT recompile.

Numerical contract (matching the reference main stack):
  * generate(): context = [uncond, cond]; eps = uncond + s * (cond - uncond)
    (diffusion.py:227-235).
  * inpaint(): context = [cond, uncond]; eps = cond + s * (cond - uncond);
    per-step re-noise of the original latent uses the *predicted* noise
    (diffusion.py:367-398 — semantics of the working demo copy,
    demo/models/diffusion.py:201-358, with the scale_img NameError of
    SURVEY 2.12.2 fixed).
  * one-step (SwiftBrush): single UNet eval at t=999 with alpha_T^2 = 0.0047
    (diffusion.py:57-129, constants at :111).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_tpu import schedulers as S
from stable_diffusion_tpu.models import clip as clip_m
from stable_diffusion_tpu.models import unet as unet_m
from stable_diffusion_tpu.models import vae as vae_m

MAX_TEXT_LEN = 77


def scale_img(x, old_range, new_range, clamp: bool = False):
    """Linear range rescale (reference utils/datasets.py:15-23)."""
    old_min, old_max = old_range
    new_min, new_max = new_range
    x = (x - old_min) * (new_max - new_min) / (old_max - old_min) + new_min
    if clamp:
        x = jnp.clip(x, new_min, new_max) if isinstance(x, jnp.ndarray) else np.clip(x, new_min, new_max)
    return x


def preprocess_image(img, img_size: Tuple[int, int]) -> np.ndarray:
    """PIL/array -> NHWC float32 in [-1, 1] (the intended behavior of
    reference _preprocess_image, diffusion.py:46-55 — whose trailing permute
    is a latent layout bug; we produce the layout the VAE expects)."""
    from PIL import Image

    if isinstance(img, np.ndarray):
        img = Image.fromarray(img.astype(np.uint8))
    img = img.convert("RGB").resize((img_size[1], img_size[0]), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = (arr - 0.5) / 0.5
    return arr[None]  # (1, H, W, 3)


def _unpack_images(imgs) -> np.ndarray:
    """Fetch a lane-packed (b, h, w*3) device image batch (_finalize_images)
    and restore NHWC (b, h, w, 3).  The reshape is free on host."""
    arr = np.asarray(imgs)
    b, h, wc = arr.shape
    return arr.reshape(b, h, wc // 3, 3)


def preprocess_mask(mask, img_size: Tuple[int, int]) -> np.ndarray:
    """PIL mask -> bool (1, H/8, W/8, 1): True = regenerate (masked) region
    (reference diffusion.py:352-358: bicubic 1/8 downsample, (0,255)->(0,1),
    cast to bool)."""
    from PIL import Image

    if isinstance(mask, np.ndarray):
        mask = Image.fromarray(mask.astype(np.uint8))
    mask = mask.convert("L").resize((img_size[1], img_size[0]))
    arr = np.asarray(mask, dtype=np.float32)[None, :, :, None]
    small = jax.image.resize(
        jnp.asarray(arr), (1, img_size[0] // 8, img_size[1] // 8, 1), method="bicubic"
    )
    small = scale_img(small, (0.0, 255.0), (0.0, 1.0))
    return np.asarray(small).astype(bool)


@dataclasses.dataclass
class StableDiffusion:
    """Bundle of params + configs + jitted programs.

    params: {"unet": ..., "text_encoder": ..., "vae": ...} pytrees.
    """

    params: Dict[str, Any]
    unet_config: unet_m.UNetConfig
    text_config: clip_m.CLIPTextConfig
    vae_config: vae_m.VAEConfig = dataclasses.field(default_factory=vae_m.VAEConfig)
    scheduler_config: Optional[dict] = None  # from scheduler_config.json
    tokenizer: Any = None
    dtype: Any = jnp.float32
    impl: str = "auto"  # attention kernel selection
    sd_version: str = "2.1"

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        pretrained_dir: str,
        *,
        sd_version: str = "1.5",
        dtype=jnp.float32,
        tokenizer=None,
        impl: str = "auto",
    ) -> "StableDiffusion":
        """Load a stock diffusers-layout model directory (vae/, text_encoder/,
        unet/, scheduler/) — reference diffusion.py:38-44 — or, when
        ``pretrained_dir`` is a FILE, a single CompVis/LDM checkpoint
        (v1-5-pruned-emaonly.ckpt style; the reference inference CLI's
        default path, reference inference.py:102-124 -> model_converter
        load_weights :2744).  Configs then come from ``sd_version``
        (1.x: SD1.5 topology + epsilon; 2.x: SD2.1 + v-prediction)."""
        import json

        from stable_diffusion_tpu.utils import model_converter as mc

        if os.path.isfile(pretrained_dir):
            params = mc.load_ldm_checkpoint(
                pretrained_dir, sd_version=sd_version, dtype=dtype)
            v1 = sd_version.startswith("1")
            return cls(
                params=params,
                unet_config=unet_m.UNetConfig.sd15() if v1 else unet_m.UNetConfig.sd21(),
                text_config=(clip_m.CLIPTextConfig.vit_l() if v1
                             else clip_m.CLIPTextConfig.vit_h()),
                vae_config=vae_m.VAEConfig(),
                scheduler_config={
                    "num_train_timesteps": 1000, "beta_start": 0.00085,
                    "beta_end": 0.012,
                    "prediction_type": "epsilon" if v1 else "v_prediction",
                },
                tokenizer=tokenizer,
                dtype=dtype,
                impl=impl,
                sd_version=sd_version,
            )

        with open(os.path.join(pretrained_dir, "unet", "config.json")) as f:
            ucfg = unet_m.UNetConfig.from_dict(json.load(f))
        with open(os.path.join(pretrained_dir, "text_encoder", "config.json")) as f:
            tcfg = clip_m.CLIPTextConfig.from_dict(json.load(f))
        with open(os.path.join(pretrained_dir, "vae", "config.json")) as f:
            vcfg = vae_m.VAEConfig.from_dict(json.load(f))
        sched_path = os.path.join(pretrained_dir, "scheduler", "scheduler_config.json")
        sched_cfg = None
        if os.path.exists(sched_path):
            with open(sched_path) as f:
                sched_cfg = json.load(f)

        params = {
            "unet": mc.load_unet_diffusers(
                os.path.join(pretrained_dir, "unet", "diffusion_pytorch_model.safetensors"),
                sd_version=sd_version,
                dtype=dtype,
            ),
            "text_encoder": mc.load_text_encoder_diffusers(
                os.path.join(pretrained_dir, "text_encoder", "model.safetensors"), dtype=dtype
            ),
            "vae": mc.load_vae_diffusers(
                os.path.join(pretrained_dir, "vae", "diffusion_pytorch_model.safetensors"),
                dtype=dtype,
            ),
        }
        return cls(
            params=params,
            unet_config=ucfg,
            text_config=tcfg,
            vae_config=vcfg,
            scheduler_config=sched_cfg,
            tokenizer=tokenizer,
            dtype=dtype,
            impl=impl,
            sd_version=sd_version,
        )

    def shard(self, mesh) -> "StableDiffusion":
        """Place all params on a ("data", "model") mesh per the TP rules
        (parallel/mesh.py); generation then runs sharded under GSPMD —
        batch replicated or dp-sharded by the caller, transformer linears
        tensor-parallel over "model"."""
        from stable_diffusion_tpu.parallel import mesh as pmesh

        self.params = {k: pmesh.shard_params(v, mesh) for k, v in self.params.items()}
        return self

    # ------------------------------------------------------------------
    # Schedules
    # ------------------------------------------------------------------

    def make_schedule(self, use_cosine_schedule: bool = False) -> S.DiffusionSchedule:
        cfg = self.scheduler_config or {}
        return S.make_schedule(
            num_train_timesteps=cfg.get("num_train_timesteps", 1000),
            beta_start=cfg.get("beta_start", 0.00085),
            beta_end=cfg.get("beta_end", 0.012),
            use_cosine_schedule=use_cosine_schedule,
            prediction_type=cfg.get("prediction_type", "epsilon"),
        )

    # ------------------------------------------------------------------
    # Text conditioning
    # ------------------------------------------------------------------

    def tokenize(self, prompts: Sequence[str]) -> np.ndarray:
        assert self.tokenizer is not None, "pass tokenizer= or pre-tokenized ids"
        enc = self.tokenizer.batch_encode_plus(
            list(prompts), padding="max_length", max_length=MAX_TEXT_LEN, truncation=True
        )
        return np.asarray(enc.input_ids, dtype=np.int32)

    def encode_text(self, input_ids) -> jax.Array:
        return _encode_text_jit(
            self.params["text_encoder"], jnp.asarray(input_ids), self.text_config,
            self.dtype, self.impl,
        )

    # ------------------------------------------------------------------
    # Generation
    # ------------------------------------------------------------------

    def generate(
        self,
        prompt: str | Sequence[str],
        *,
        uncond_prompt: str | Sequence[str] = "",
        input_image=None,
        img_size: Tuple[int, int] = (512, 512),
        do_cfg: bool = True,
        cfg_scale: float = 7.5,
        strength: float = 0.8,
        inference_steps: int = 50,
        sampler: str = "ddim",
        use_cosine_schedule: bool = False,
        eta: float = 0.0,
        seed: int = 0,
        batch_size: int = 1,
        deepcache_interval: int = 1,
        cond_ids=None,
        uncond_ids=None,
        input_latents=None,
        initial_latents=None,
        context=None,
        return_latents: bool = False,
        progress_callback=None,
        progress_every: int = 5,
        output_dtype: str = "float32",
        device_output: bool = False,
    ) -> np.ndarray:
        """txt2img / img2img (reference diffusion.py:131-257).

        Returns images in [0, 1], NHWC float32 — or NHWC uint8 when
        ``output_dtype="uint8"`` (the serving format; 4x less host-transfer
        on remote-TPU transports).  ``device_output=True`` returns the
        jax.Array WITHOUT fetching to host, in the lane-packed (b, h, w*3)
        transfer layout — a serving loop can dispatch the next batch before
        fetching this one (overlapping transfer with compute) and restore
        NHWC with pipeline._unpack_images.  ``cond_ids``/``uncond_ids``
        bypass the tokenizer (for tests); ``input_latents`` bypasses the VAE
        encoder for img2img; ``initial_latents`` injects the txt2img starting
        noise (parity tests — replaces matching torch RNG streams);
        ``context`` supplies precomputed conditioning (B[, S], D) directly —
        the class-conditional "class2img" mode of the demo stack
        (demo/models/diffusion.py:40-42) passes ClassEncoder embeddings here.

        ``prompt``/``uncond_prompt`` may also be a SEQUENCE of strings — one
        per batch lane — so a serving batch can carry distinct requests
        (beyond the reference, whose surface is single-prompt,
        diffusion.py:131-141; same program, no recompile: only the token
        ids change).  A prompt list sets ``batch_size`` to its length.
        """
        if not isinstance(prompt, str):
            prompts = list(prompt)
            if batch_size not in (1, len(prompts)):
                raise ValueError(
                    f"batch_size={batch_size} conflicts with a "
                    f"{len(prompts)}-prompt list; omit batch_size or match it")
            batch_size = len(prompts)
        else:
            prompts = [prompt] * batch_size
        if not isinstance(uncond_prompt, str):
            uncond_prompts = list(uncond_prompt)
            if len(uncond_prompts) != batch_size:
                raise ValueError(
                    f"uncond_prompt list has {len(uncond_prompts)} entries "
                    f"for batch_size={batch_size}")
        else:
            uncond_prompts = [uncond_prompt] * batch_size
        schedule = self.make_schedule(use_cosine_schedule)
        h, w = img_size
        lat_shape = (batch_size, h // 8, w // 8, 4)
        key = jax.random.key(seed)
        key_img, key_lat, key_steps = jax.random.split(key, 3)

        # --- text conditioning (reference diffusion.py:190-200) ---
        if context is not None:
            # precomputed conditioning (e.g. ClassEncoder "class2img"):
            # (B, D) broadcasts to a length-1 token sequence like the
            # reference's cond.unsqueeze (models/unet/attention.py:77-79)
            context = jnp.asarray(context, self.dtype)
            if context.ndim == 2:
                context = context[:, None, :]
        if cond_ids is None and context is None:
            cond_ids = self.tokenize(prompts)
        if do_cfg and uncond_ids is None and context is None:
            uncond_ids = self.tokenize(uncond_prompts)

        # --- timestep sequence (static per (steps, strength)) ---
        ts = S.inference_timesteps(schedule, inference_steps, kind=sampler)
        is_img2img = input_image is not None or input_latents is not None
        if is_img2img:
            ts = S.apply_strength(ts, strength)
        prev_ts = ts - schedule.num_train_timesteps // inference_steps
        table = jnp.asarray(schedule.alphas_hat)

        # --- fast path: the whole txt2img program is ONE device dispatch
        # (text encode + latents + scan + decode); per-dispatch overhead on
        # remote TPU transports is ~30 ms, and the modular path below costs
        # six of them ---
        if (not is_img2img and initial_latents is None and not return_latents
                and context is None and progress_callback is None):
            imgs = _txt2img_jit(
                self.params,
                jnp.asarray(cond_ids),
                jnp.asarray(uncond_ids if do_cfg else cond_ids),
                jnp.asarray(ts),
                jnp.asarray(prev_ts),
                table,
                jnp.asarray(cfg_scale, jnp.float32),
                jax.random.key(seed),
                (batch_size, h // 8, w // 8, 4),
                self.unet_config,
                self.text_config,
                self.vae_config,
                self.dtype,
                do_cfg,
                sampler,
                schedule.prediction_type,
                float(eta),
                self.impl,
                int(deepcache_interval),
                output_dtype == "uint8",
            )
            return imgs if device_output else _unpack_images(imgs)

        # --- fused one-dispatch img2img: encode (or take latents) +
        # q-sample + scan + decode in a single program.  Checked BEFORE
        # context materialization so generate(input_latents=...) actually
        # takes this path (round-1 bug: the guard sat below the encode) ---
        if (is_img2img and not return_latents and context is None
                and progress_callback is None):
            if input_latents is None:
                img_or_lat = jnp.asarray(preprocess_image(input_image, img_size), self.dtype)
                has_image = True
            else:
                img_or_lat = jnp.asarray(input_latents, self.dtype)
                has_image = False
            imgs = _img2img_jit(
                self.params,
                jnp.asarray(cond_ids),
                jnp.asarray(uncond_ids if do_cfg else cond_ids),
                img_or_lat,
                jnp.asarray(ts),
                jnp.asarray(prev_ts),
                table,
                jnp.asarray(cfg_scale, jnp.float32),
                jax.random.key(seed),
                lat_shape,
                self.unet_config,
                self.text_config,
                self.vae_config,
                self.dtype,
                do_cfg,
                sampler,
                schedule.prediction_type,
                float(eta),
                self.impl,
                has_image,
                int(deepcache_interval),
                output_dtype == "uint8",
            )
            return imgs if device_output else _unpack_images(imgs)

        if context is None:
            if do_cfg:
                cond_emb = self.encode_text(cond_ids)
                uncond_emb = self.encode_text(uncond_ids)
                context = jnp.concatenate([uncond_emb, cond_emb], axis=0)
            else:
                context = self.encode_text(cond_ids)

        # --- initial latents (reference diffusion.py:202-216) ---
        if is_img2img:
            if input_latents is None:
                img = jnp.asarray(preprocess_image(input_image, img_size), self.dtype)
                enc_noise = jax.random.normal(key_img, (1, *lat_shape[1:]), self.dtype)
                input_latents, _, _ = _encode_image_jit(
                    self.params["vae"], img, self.vae_config, enc_noise, self.impl
                )
            lat_noise = jax.random.normal(key_lat, lat_shape, self.dtype)
            latents = S.forward_process(
                table, jnp.asarray(input_latents, self.dtype), jnp.asarray(ts[0]), lat_noise
            )
        elif initial_latents is not None:
            latents = jnp.asarray(initial_latents, self.dtype)
        else:
            latents = jax.random.normal(key_lat, lat_shape, self.dtype)

        # --- jitted scan denoise + decode ---
        denoise_args = (
            table,
            jnp.asarray(cfg_scale, jnp.float32),
        )
        if progress_callback is None:
            latents = _denoise_jit(
                self.params["unet"],
                latents,
                context.astype(self.dtype),
                jnp.asarray(ts),
                jnp.asarray(prev_ts),
                table,
                jnp.asarray(cfg_scale, jnp.float32),
                key_steps,
                self.unet_config,
                do_cfg,
                sampler,
                schedule.prediction_type,
                float(eta),
                self.impl,
                int(deepcache_interval),
            )
        else:
            # progress mode (reference demo/models/diffusion.py:55-70 tqdm/
            # gr.Progress): the scan is chunked into segments of
            # ``progress_every`` steps — one dispatch per segment, callback
            # after each.  DDIM eta=0 matches the single-scan path exactly;
            # stochastic samplers draw a fresh key per segment.
            n = len(ts)
            c = max(1, int(progress_every))
            seg_keys = jax.random.split(key_steps, (n + c - 1) // c)
            progress_callback(0, n)
            for i in range(0, n, c):
                latents = _denoise_jit(
                    self.params["unet"],
                    latents,
                    context.astype(self.dtype),
                    jnp.asarray(ts[i:i + c]),
                    jnp.asarray(prev_ts[i:i + c]),
                    table,
                    jnp.asarray(cfg_scale, jnp.float32),
                    seg_keys[i // c],
                    self.unet_config,
                    do_cfg,
                    sampler,
                    schedule.prediction_type,
                    float(eta),
                    self.impl,
                    int(deepcache_interval),
                )
                progress_callback(min(i + c, n), n)
        if return_latents:
            return np.asarray(latents)
        imgs = _decode_jit(self.params["vae"], latents, self.vae_config, self.impl)
        out = np.asarray((imgs.astype(jnp.float32) + 1.0) / 2.0)
        if output_dtype == "uint8":
            out = np.round(np.clip(out, 0.0, 1.0) * 255.0).astype(np.uint8)
        return out

    def generate_in_one_step(
        self,
        prompt: str | Sequence[str],
        *,
        img_size: Tuple[int, int] = (512, 512),
        seed: int = 0,
        batch_size: int = 1,
        cond_ids=None,
        output_dtype: str = "float32",
        device_output: bool = False,
    ) -> np.ndarray:
        """SwiftBrush one-step generation (reference diffusion.py:57-129).

        ``device_output=True`` skips the host fetch and returns the
        lane-packed (b, h, w*3) array (see generate()).  ``prompt`` may be a
        sequence of strings: fewer prompts than ``batch_size`` cycle over
        the lanes (the jitted program ceil-tiles the contexts); MORE prompts
        than ``batch_size`` set the batch to the list length (as generate()
        does) — an explicit smaller batch_size is a ValueError, never a
        silent drop."""
        if not isinstance(prompt, str):
            prompts = list(prompt)
            if len(prompts) > batch_size:
                if batch_size != 1:
                    raise ValueError(
                        f"batch_size={batch_size} conflicts with a "
                        f"{len(prompts)}-prompt list; omit batch_size or "
                        f"pass at most batch_size prompts")
                batch_size = len(prompts)
        else:
            prompts = [prompt]
        h, w = img_size
        lat_shape = (batch_size, h // 8, w // 8, 4)
        key = jax.random.key(seed)
        if cond_ids is None:
            cond_ids = self.tokenize(prompts)
        imgs = _one_step_full_jit(
            self.params, jnp.asarray(cond_ids), key, lat_shape, batch_size,
            self.unet_config, self.text_config, self.vae_config, self.impl, self.dtype,
            output_dtype == "uint8",
        )
        return imgs if device_output else _unpack_images(imgs)

    def inpaint(
        self,
        prompt: str,
        input_image,
        mask,
        *,
        uncond_prompt: str = "",
        img_size: Tuple[int, int] = (512, 512),
        do_cfg: bool = True,
        cfg_scale: float = 7.5,
        strength: float = 0.8,
        inference_steps: int = 50,
        sampler: str = "ddpm",
        use_cosine_schedule: bool = False,
        seed: int = 0,
        cond_ids=None,
        uncond_ids=None,
        progress_callback=None,
        progress_every: int = 5,
    ) -> np.ndarray:
        """Mask-blended inpainting (reference diffusion.py:260-417 /
        demo/models/diffusion.py:201-358).  Returns (H, W, 3) uint8."""
        schedule = self.make_schedule(use_cosine_schedule)
        h, w = img_size
        lat_shape = (1, h // 8, w // 8, 4)
        key = jax.random.key(seed)

        # context = [cond, uncond] — note the order differs from generate()
        # (reference diffusion.py:337-343)
        if cond_ids is None:
            cond_ids = self.tokenize([prompt])
        if do_cfg and uncond_ids is None:
            uncond_ids = self.tokenize([uncond_prompt])
        if do_cfg:
            ids = np.concatenate([cond_ids, uncond_ids], axis=0)
            context = self.encode_text(ids)
        else:
            context = self.encode_text(cond_ids)

        img = jnp.asarray(preprocess_image(input_image, img_size), self.dtype)
        mask_small = jnp.asarray(preprocess_mask(mask, img_size))  # (1,h/8,w/8,1) bool

        ts = S.apply_strength(
            S.inference_timesteps(schedule, inference_steps, kind=sampler), strength
        )
        prev_ts = ts - schedule.num_train_timesteps // inference_steps
        table = jnp.asarray(schedule.alphas_hat)

        if progress_callback is None:
            imgs = _inpaint_jit(
                self.params,
                img,
                mask_small,
                context.astype(self.dtype),
                jnp.asarray(ts),
                jnp.asarray(prev_ts),
                table,
                jnp.asarray(cfg_scale, jnp.float32),
                key,
                lat_shape,
                self.unet_config,
                self.vae_config,
                self.dtype,
                do_cfg,
                sampler,
                schedule.prediction_type,
                self.impl,
            )
        else:
            # progress mode: same draws as _inpaint_jit's prologue, denoise
            # chunked into ``progress_every``-step dispatches with a callback
            # after each (reference demo gr.Progress, demo/app.py:137-185)
            k_enc, k_lat, k_mask, k_steps = jax.random.split(key, 4)
            enc_noise = jax.random.normal(k_enc, lat_shape, self.dtype)
            encoded_img, _, _ = _encode_image_jit(
                self.params["vae"], img, self.vae_config, enc_noise, self.impl
            )
            lat_noise = jax.random.normal(k_lat, lat_shape, self.dtype)
            latents = S.forward_process(
                table, encoded_img, jnp.asarray(ts[0]), lat_noise
            )
            noise_features = jax.random.normal(k_mask, lat_shape, self.dtype)
            latents = jnp.where(mask_small, noise_features, latents)
            n = len(ts)
            c = max(1, int(progress_every))
            seg_keys = jax.random.split(k_steps, (n + c - 1) // c)
            progress_callback(0, n)
            for i in range(0, n, c):
                latents = _inpaint_denoise_jit(
                    self.params["unet"],
                    latents,
                    encoded_img,
                    mask_small,
                    context.astype(self.dtype),
                    jnp.asarray(ts[i:i + c]),
                    jnp.asarray(prev_ts[i:i + c]),
                    table,
                    jnp.asarray(cfg_scale, jnp.float32),
                    seg_keys[i // c],
                    self.unet_config,
                    do_cfg,
                    sampler,
                    schedule.prediction_type,
                    self.impl,
                )
                progress_callback(min(i + c, n), n)
            imgs = _decode_jit(
                self.params["vae"], latents, self.vae_config, self.impl
            ).astype(jnp.float32)
        arr = np.asarray(imgs)
        if arr.ndim == 3:  # lane-packed (b, h, w*3) from _inpaint_jit
            arr = arr.reshape(arr.shape[0], arr.shape[1], -1, 3)
        out = scale_img(arr, (-1.0, 1.0), (0.0, 255.0), clamp=True)
        return out[0].astype(np.uint8)

    # ------------------------------------------------------------------
    # Training loss (reference diffusion.py:419-443)
    # ------------------------------------------------------------------

    def training_loss(self, unet_params, images, input_ids, t, noise, *, key=None):
        """Frozen CLIP+VAE encode, forward-process, UNet prediction, MSE.

        ``t``/``noise`` are supplied by the caller (sampled from its PRNG)
        so the loss is a pure function of (unet_params, batch)."""
        schedule = self.make_schedule()
        table = jnp.asarray(schedule.alphas_hat)
        text_emb = jax.lax.stop_gradient(self.encode_text(input_ids))
        latents, _, _ = vae_m.encode(
            self.params["vae"], images, self.vae_config,
            noise=jnp.zeros((*images.shape[:1], images.shape[1] // 8, images.shape[2] // 8, 4), images.dtype),
            impl=self.impl,
        )
        latents = jax.lax.stop_gradient(latents)
        x_t = S.forward_process(table, latents, t, noise)
        pred = unet_m.unet_apply(
            unet_params, x_t, t, text_emb, self.unet_config, impl=self.impl
        )
        if schedule.prediction_type == "v_prediction":
            target = S.v_prediction_targets(table, latents, noise, t)
        else:
            target = noise
        return jnp.mean((pred - target) ** 2)


# ---------------------------------------------------------------------------
# Jitted programs (module-level so the XLA cache is shared across pipelines)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _encode_text_jit(params, ids, cfg, dtype, impl):
    return clip_m.text_model_apply(params, ids, cfg, impl=impl, dtype=dtype)


@functools.partial(jax.jit, static_argnums=(2, 4))
def _encode_image_jit(params, img, cfg, noise, impl):
    return vae_m.encode(params, img, cfg, noise=noise, impl=impl)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _decode_jit(params, latents, cfg, impl):
    return vae_m.decode(params, latents, cfg, impl=impl)


def _cfg_combine(pred, cfg_scale, order: str):
    """order "uncond_first": eps = uncond + s*(cond - uncond) (generate);
    order "cond_first":   eps = cond + s*(cond - uncond) (inpaint)."""
    a, b = jnp.split(pred, 2, axis=0)
    if order == "uncond_first":
        uncond, cond = a, b
        return uncond + cfg_scale.astype(pred.dtype) * (cond - uncond)
    cond, uncond = a, b
    return cond + cfg_scale.astype(pred.dtype) * (cond - uncond)


def _sampler_step(table, lat, t, pt, eps_hat, key, sampler, prediction_type, eta):
    if sampler == "ddpm":
        noise = jax.random.normal(key, lat.shape, lat.dtype)
        return S.ddpm_step(table, lat, t, pt, eps_hat, noise)
    noise = jax.random.normal(key, lat.shape, lat.dtype) if eta > 0 else None
    return S.ddim_step(
        table, lat, t, pt, eps_hat, prediction_type=prediction_type, eta=eta, noise=noise
    )



def _finalize_images(imgs, out_u8: bool):
    """[-1,1] model output -> [0,1] f32, or uint8 (the serving format: a
    512^2 u8 image is 4x smaller over remote-TPU transports than f32).

    Returns images LANE-PACKED as (b, h, w*3): TPU tiles the trailing two
    dims ((32,128) for u8), so a trailing dim of 3 is lane-padded 3->128 and
    a device->host fetch of NHWC images moves at ~14 MB/s on the relay vs
    ~47 MB/s packed (benchmarks/probe_fetch_shapes.py — 3.3x).  Host callers
    reshape back to (b, h, w, 3) after the fetch, which is free in numpy."""
    x = (imgs.astype(jnp.float32) + 1.0) / 2.0
    if out_u8:
        x = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    b, h, w, c = x.shape
    return x.reshape(b, h, w * c)


@functools.partial(jax.jit, static_argnums=tuple(range(8, 20)))
def _txt2img_jit(
    params, cond_ids, uncond_ids, ts, prev_ts, table, cfg_scale, key,
    lat_shape, ucfg, tcfg, vcfg, dtype, do_cfg, sampler, prediction_type, eta, impl,
    deepcache_interval, out_u8=False,
):
    """Whole txt2img as one program: batched (uncond, cond) text encode ->
    latents from the key -> scan denoise -> VAE decode -> images in [0, 1].

    The 3-way key split matches the modular path (generate() with
    return_latents) draw-for-draw, so both produce identical images."""
    _, key_lat, key_steps = jax.random.split(key, 3)
    if do_cfg:
        ids = jnp.concatenate([uncond_ids, cond_ids], axis=0)
        context = clip_m.text_model_apply(
            params["text_encoder"], ids, tcfg, impl=impl, dtype=dtype
        )
    else:
        context = clip_m.text_model_apply(
            params["text_encoder"], cond_ids, tcfg, impl=impl, dtype=dtype
        )
    latents = jax.random.normal(key_lat, lat_shape, dtype)
    latents = _denoise_scan(
        params["unet"], latents, context.astype(dtype), ts, prev_ts, table,
        cfg_scale, key_steps, ucfg, do_cfg, sampler, prediction_type, eta, impl,
        deepcache_interval,
    )
    imgs = vae_m.decode(params["vae"], latents, vcfg, impl=impl)
    return _finalize_images(imgs, out_u8)


@functools.partial(jax.jit, static_argnums=tuple(range(9, 22)))
def _img2img_jit(
    params, cond_ids, uncond_ids, img_or_lat, ts, prev_ts, table, cfg_scale, key,
    lat_shape, ucfg, tcfg, vcfg, dtype, do_cfg, sampler, prediction_type, eta,
    impl, has_image, deepcache_interval, out_u8=False,
):
    """Whole img2img as one program (reference diffusion.py:202-216 path):
    [VAE encode ->] q-sample at ts[0] -> scan denoise -> decode."""
    key_img, key_lat, key_steps = jax.random.split(key, 3)
    if do_cfg:
        ids = jnp.concatenate([uncond_ids, cond_ids], axis=0)
        context = clip_m.text_model_apply(params["text_encoder"], ids, tcfg, impl=impl, dtype=dtype)
    else:
        context = clip_m.text_model_apply(params["text_encoder"], cond_ids, tcfg, impl=impl, dtype=dtype)
    if has_image:
        enc_noise = jax.random.normal(key_img, (1, *lat_shape[1:]), dtype)
        lat0, _, _ = vae_m.encode(params["vae"], img_or_lat, vcfg, noise=enc_noise, impl=impl)
    else:
        lat0 = img_or_lat
    lat_noise = jax.random.normal(key_lat, lat_shape, dtype)
    latents = S.forward_process(table, lat0, ts[0], lat_noise)
    latents = _denoise_scan(
        params["unet"], latents, context.astype(dtype), ts, prev_ts, table,
        cfg_scale, key_steps, ucfg, do_cfg, sampler, prediction_type, eta, impl,
        deepcache_interval,
    )
    imgs = vae_m.decode(params["vae"], latents, vcfg, impl=impl)
    return _finalize_images(imgs, out_u8)


def _denoise_scan(
    unet_params, latents, context, ts, prev_ts, table, cfg_scale, key,
    ucfg, do_cfg, sampler, prediction_type, eta, impl, deepcache_interval=1,
):
    if deepcache_interval <= 1:
        def step(carry, xs):
            lat, key = carry
            t, pt = xs
            key, sub = jax.random.split(key)
            model_in = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
            pred = unet_m.unet_apply(unet_params, model_in, t[None], context, ucfg, impl=impl)
            eps_hat = _cfg_combine(pred, cfg_scale, "uncond_first") if do_cfg else pred
            lat = _sampler_step(table, lat, t, pt, eps_hat, sub, sampler, prediction_type, eta)
            return (lat, key), None

        (latents, _), _ = jax.lax.scan(step, (latents, key), (ts, prev_ts))
        return latents

    # DeepCache block caching (arXiv 2312.03209): full UNet every k-th step,
    # shallow-stage-only with the cached deep trunk in between
    b = latents.shape[0] * (2 if do_cfg else 1)
    h, w = latents.shape[1], latents.shape[2]
    deep_ch = ucfg.block_out_channels[1]
    deep0 = jnp.zeros((b, h, w, deep_ch), latents.dtype)

    def step(carry, xs):
        lat, key, deep = carry
        t, pt, idx = xs
        key, sub = jax.random.split(key)
        model_in = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat

        def full(_):
            return unet_m.unet_apply_split(
                unet_params, model_in, t[None], context, ucfg, impl=impl
            )

        def cached(d):
            return (
                unet_m.unet_apply_cached(
                    unet_params, model_in, t[None], context, d, ucfg, impl=impl
                ),
                d,
            )

        pred, deep = jax.lax.cond(idx % deepcache_interval == 0, full, cached, deep)
        eps_hat = _cfg_combine(pred, cfg_scale, "uncond_first") if do_cfg else pred
        lat = _sampler_step(table, lat, t, pt, eps_hat, sub, sampler, prediction_type, eta)
        return (lat, key, deep), None

    idxs = jnp.arange(ts.shape[0])
    (latents, _, _), _ = jax.lax.scan(step, (latents, key, deep0), (ts, prev_ts, idxs))
    return latents


@functools.partial(jax.jit, static_argnums=(8, 9, 10, 11, 12, 13, 14))
def _denoise_jit(
    unet_params, latents, context, ts, prev_ts, table, cfg_scale, key,
    ucfg, do_cfg, sampler, prediction_type, eta, impl, deepcache_interval=1,
):
    """The hot loop (reference diffusion.py:223-236) as one lax.scan."""
    return _denoise_scan(
        unet_params, latents, context, ts, prev_ts, table, cfg_scale, key,
        ucfg, do_cfg, sampler, prediction_type, eta, impl, deepcache_interval,
    )


@functools.partial(jax.jit, static_argnums=tuple(range(9, 17)))
def _inpaint_jit(
    params, img, mask, context, ts, prev_ts, table, cfg_scale, key,
    lat_shape, ucfg, vcfg, dtype, do_cfg, sampler, prediction_type, impl,
):
    """Whole inpaint as one program: VAE encode -> q-sample at ts[0] ->
    mask-blend noise into the masked region -> blended scan -> decode
    (reference diffusion.py:344-417).  Returns images in [-1, 1],
    lane-packed as (b, h, w*3) for the host fetch."""
    k_enc, k_lat, k_mask, k_steps = jax.random.split(key, 4)
    enc_noise = jax.random.normal(k_enc, lat_shape, dtype)
    encoded_img, _, _ = vae_m.encode(params["vae"], img, vcfg, noise=enc_noise, impl=impl)
    lat_noise = jax.random.normal(k_lat, lat_shape, dtype)
    latents = S.forward_process(table, encoded_img, ts[0], lat_noise)
    noise_features = jax.random.normal(k_mask, lat_shape, dtype)
    latents = jnp.where(mask, noise_features, latents)
    latents = _inpaint_denoise_scan(
        params["unet"], latents, encoded_img, mask, context, ts, prev_ts, table,
        cfg_scale, k_steps, ucfg, do_cfg, sampler, prediction_type, impl,
    )
    imgs = vae_m.decode(params["vae"], latents, vcfg, impl=impl).astype(jnp.float32)
    # lane-pack (b, h, w*3) for the host fetch (see _finalize_images)
    b, h, w, c = imgs.shape
    return imgs.reshape(b, h, w * c)


def _inpaint_denoise_scan(
    unet_params, latents, encoded_img, mask, context, ts, prev_ts, table,
    cfg_scale, key, ucfg, do_cfg, sampler, prediction_type, impl,
):
    """Mask-blended scan (reference diffusion.py:367-398): outside the mask,
    replace with the original re-noised by the *predicted* noise each step."""

    def step(carry, xs):
        lat, key = carry
        t, pt = xs
        key, sub = jax.random.split(key)
        model_in = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
        pred = unet_m.unet_apply(unet_params, model_in, t[None], context, ucfg, impl=impl)
        eps_hat = _cfg_combine(pred, cfg_scale, "cond_first") if do_cfg else pred
        noised_orig = S.forward_process(table, encoded_img, t, eps_hat)
        lat = jnp.where(mask, lat, noised_orig)
        lat = _sampler_step(table, lat, t, pt, eps_hat, sub, sampler, prediction_type, 0.0)
        return (lat, key), None

    (latents, _), _ = jax.lax.scan(step, (latents, key), (ts, prev_ts))
    return latents


_inpaint_denoise_jit = jax.jit(
    _inpaint_denoise_scan, static_argnums=(10, 11, 12, 13, 14)
)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _one_step_jit(unet_params, vae_params, latents, context, ucfg, vcfg, impl):
    """SwiftBrush: x0 = (z - sigma_T * eps_hat) / alpha_T with
    alpha_T^2 = 0.0047 (reference diffusion.py:111-113)."""
    alpha_t = jnp.sqrt(jnp.float32(0.0047)).astype(latents.dtype)
    sigma_t = jnp.sqrt(jnp.float32(1.0 - 0.0047)).astype(latents.dtype)
    t = jnp.full((1,), 999, jnp.int32)
    eps = unet_m.unet_apply(unet_params, latents, t, context, ucfg, impl=impl)
    x0 = (latents - sigma_t * eps) / alpha_t
    return vae_m.decode(vae_params, x0, vcfg, impl=impl)


@functools.partial(jax.jit, static_argnums=tuple(range(3, 11)))
def _one_step_full_jit(params, cond_ids, key, lat_shape, batch_size, ucfg, tcfg,
                       vcfg, impl, dtype, out_u8=False):
    """SwiftBrush one-step as one program: text encode + latents + UNet +
    decode (reference diffusion.py:57-129)."""
    context = clip_m.text_model_apply(
        params["text_encoder"], cond_ids, tcfg, impl=impl, dtype=dtype
    )
    if batch_size != context.shape[0]:
        # ceil-tile then slice so a non-divisible batch (e.g. b=3 over 2
        # prompts) still yields exactly batch_size rows, cycling the prompts
        reps = -(-batch_size // context.shape[0])
        context = jnp.tile(context, (reps, 1, 1))[:batch_size]
    latents = jax.random.normal(key, lat_shape, dtype)
    imgs = _one_step_jit(
        params["unet"], params["vae"], latents, context.astype(dtype), ucfg, vcfg, impl
    )
    return _finalize_images(imgs, out_u8)
