"""CLIP vision tower / CLIP-score parity vs HF transformers; quantization;
datasets; checkpoint roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from stable_diffusion_tpu.models import clip as jclip
from stable_diffusion_tpu.utils.torch_interop import from_torch_state_dict
from tests.test_cli import model_dir  # noqa: F401  (fixture for the CLI test)


@pytest.fixture(scope="module")
def hf_clip():
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    torch.manual_seed(0)
    cfg = CLIPConfig(
        text_config=CLIPTextConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, max_position_embeddings=16, vocab_size=100,
            hidden_act="quick_gelu", projection_dim=24,
        ).to_dict(),
        vision_config=CLIPVisionConfig(
            hidden_size=40, intermediate_size=80, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=14,
            hidden_act="quick_gelu", projection_dim=24,
        ).to_dict(),
        projection_dim=24,
    )
    return CLIPModel(cfg).eval()


def test_vision_tower_parity(hf_clip, rng):
    m = hf_clip.vision_model
    px = rng.standard_normal((2, 3, 28, 28), dtype=np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(px)).pooler_output.numpy()
    p = from_torch_state_dict(m.state_dict())
    vcfg = jclip.CLIPVisionConfig(
        hidden_size=40, intermediate_size=80, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
    )
    got = np.asarray(
        jclip.vision_model_apply(p, jnp.asarray(px.transpose(0, 2, 3, 1)), vcfg, impl="xla")
    )
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_clip_score_parity(hf_clip, rng):
    """Our clip_score vs the torchmetrics formula computed with HF CLIPModel
    (100 * max(cos(img_emb, txt_emb), 0))."""
    px_u8 = (rng.random((2, 28, 28, 3)) * 255).astype(np.float32)
    ids = rng.integers(1, 100, size=(2, 16)).astype(np.int64)

    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    px_norm = ((px_u8 / 255.0 - mean) / std).transpose(0, 3, 1, 2)
    with torch.no_grad():
        img_emb = hf_clip.get_image_features(torch.from_numpy(px_norm))
        txt_emb = hf_clip.get_text_features(torch.from_numpy(ids))
        cos = torch.nn.functional.cosine_similarity(img_emb, txt_emb)
        want = (100 * cos.clamp(min=0)).numpy()

    params = from_torch_state_dict(hf_clip.state_dict())
    vcfg = jclip.CLIPVisionConfig(
        hidden_size=40, intermediate_size=80, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
    )
    tcfg = jclip.CLIPTextConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=16, vocab_size=100,
        hidden_act="quick_gelu",
    )
    got = np.asarray(
        jclip.clip_score(params, jnp.asarray(px_u8), jnp.asarray(ids), vcfg, tcfg, impl="xla")
    )
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_weight_only_int8(rng):
    from stable_diffusion_tpu.models import layers
    from stable_diffusion_tpu.utils.quantize_model import quantize_params, quantization_error

    params = {"mlp": {"fc1": {"kernel": jnp.asarray(rng.standard_normal((64, 32), dtype=np.float32)),
                              "bias": jnp.zeros((32,))}}}
    q = quantize_params(params)
    assert q["mlp"]["fc1"]["kernel_q"].dtype == jnp.int8
    x = jnp.asarray(rng.standard_normal((4, 64), dtype=np.float32))
    y_full = layers.linear(params["mlp"]["fc1"], x)
    y_q = layers.linear(q["mlp"]["fc1"], x)
    rel = float(jnp.linalg.norm(y_full - y_q) / jnp.linalg.norm(y_full))
    assert rel < 0.02  # int8 per-channel error budget
    errs = quantization_error(params, q)
    assert all(e < 0.01 for e in errs.values())


def test_conv_kernels_not_quantized(rng):
    from stable_diffusion_tpu.utils.quantize_model import quantize_params

    params = {"conv": {"kernel": jnp.zeros((3, 3, 8, 8))}, "lin": {"kernel": jnp.ones((8, 8))}}
    q = quantize_params(params)
    assert "kernel" in q["conv"] and "kernel_q" in q["lin"]


def test_dreambooth_dataset(tmp_path, rng):
    from PIL import Image

    from stable_diffusion_tpu.utils import datasets

    for d, label in [("instance_data", "a sks dog"), ("class_prior_data", "a dog")]:
        (tmp_path / d).mkdir()
        for i in range(3):
            Image.fromarray((rng.random((20, 20, 3)) * 255).astype(np.uint8)).save(
                tmp_path / d / f"{i}.png"
            )
        (tmp_path / d / "label.txt").write_text(label)

    class FakeTok:
        def __call__(self, prompt, **kw):
            class R:
                input_ids = [1, 2, 3]

            return R()

        def pad(self, enc, *, padding, max_length, return_tensors):
            ids = np.zeros((len(enc["input_ids"]), max_length), np.int64)
            for i, row in enumerate(enc["input_ids"]):
                ids[i, : len(row)] = row

            class R:
                pass

            r = {"input_ids": ids}
            return r

    train, test = datasets.create_dataloaders(
        FakeTok(), str(tmp_path / "instance_data"), str(tmp_path / "class_prior_data"),
        train_test_split=1.0, batch_size=2, num_workers=0, img_size=(16, 16),
    )
    batch = next(iter(train))
    assert batch["pixel_values"].shape == (4, 16, 16, 3)  # [instance;class] halves
    assert batch["input_ids"].shape == (4, 77)
    assert batch["pixel_values"].min() >= -1.0 and batch["pixel_values"].max() <= 1.0


def test_checkpoint_roundtrip(tmp_path):
    from stable_diffusion_tpu.utils import checkpoint as ckpt

    state = {
        "epoch": 3,
        "state": {"lora": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": jnp.asarray(7)},
    }
    path = ckpt.save_train_checkpoint(str(tmp_path / "ck"), state)
    restored = ckpt.load_train_checkpoint(path)
    assert int(np.asarray(restored["epoch"])) == 3
    np.testing.assert_allclose(
        np.asarray(restored["state"]["lora"]["w"]), np.arange(6.0).reshape(2, 3)
    )


def test_evaluation_sweep(tmp_path, rng):
    """evaluation.generate_fake_imgs over a synthetic COCO annotation file
    with a tiny pipeline: directory layout + caption files + sweep configs."""
    import json
    import sys

    from PIL import Image

    sys.path.insert(0, "/root/repo")
    import evaluation as ev
    from tests.test_pipeline import tiny as _  # noqa: F401 (fixture import)
    from stable_diffusion_tpu.pipeline import StableDiffusion
    from stable_diffusion_tpu.models import unet as junet, vae as jvae

    ucfg = junet.UNetConfig(
        block_out_channels=(32, 64, 64, 64), attention_head_dim=(2, 4, 4, 4),
        cross_attention_dim=24, t_embed_dim=16,
    )
    tcfg = jclip.CLIPTextConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=77, vocab_size=64,
    )
    vcfg = jvae.VAEConfig(ch_mult=(1, 1, 1, 1), base_channels=32)
    ks = jax.random.split(jax.random.key(0), 3)
    pipe = StableDiffusion(
        params={
            "unet": junet.init_unet(ks[0], ucfg),
            "text_encoder": jclip.init_text_model(ks[1], tcfg),
            "vae": jvae.init_vae(ks[2], vcfg),
        },
        unet_config=ucfg, text_config=tcfg, vae_config=vcfg, impl="xla",
    )

    class FakeTok:
        def batch_encode_plus(self, prompts, **kw):
            class R:
                input_ids = [[1] * 77 for _ in prompts]

            return R()

    pipe.tokenizer = FakeTok()

    # tiny "COCO": 1 image + 1 caption
    (tmp_path / "imgs").mkdir()
    Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(
        tmp_path / "imgs" / "a.jpg"
    )
    label = {
        "images": [{"id": 1, "file_name": "a.jpg"}],
        "annotations": [{"image_id": 1, "id": 10, "caption": "a cat"}],
    }
    lf = tmp_path / "captions.json"
    lf.write_text(json.dumps(label))

    import argparse

    args = argparse.Namespace(do_cfg=True, strength=1.0, num_inference_steps=2, seed=0)
    # patch image size down for the tiny pipeline
    orig_gen = pipe.generate

    def small_gen(**kw):
        kw["img_size"] = (32, 32)
        return orig_gen(**kw)

    pipe.generate = small_gen
    ev.generate_fake_imgs(
        args, pipe, str(tmp_path / "imgs"), str(lf), str(tmp_path / "out"),
        num_samples=1,
        test_configs=[{"sampler": "ddim", "use_cosine_schedule": False}],
        cfg_scales=[3.0],
    )
    assert (tmp_path / "out" / "fake" / "3.0_ddim_linearSchedule" / "1_10.jpg").exists()
    assert (tmp_path / "out" / "original" / "1_10.jpg").exists()
    assert (tmp_path / "out" / "1_10.txt").read_text() == "a cat"


def test_static_w8a8_linear_exactness(rng):
    """The W8A8 branch of layers.linear equals the manual int8 simulation."""
    from stable_diffusion_tpu.models import layers as L
    from stable_diffusion_tpu.ops.quantize import quantize_tensor

    w = jnp.asarray(rng.standard_normal((16, 8), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(8, dtype=np.float32))
    x = jnp.asarray(rng.standard_normal((4, 16), dtype=np.float32))
    q, scale = quantize_tensor(w, axis=0)
    amax = float(np.max(np.abs(np.asarray(x))))
    p = {"kernel_q": q, "kernel_scale": scale,
         "act_scale": jnp.asarray(amax, jnp.float32), "bias": b}
    got = np.asarray(L.linear(p, x))

    s_x = amax / 127.0
    x_q = np.round(np.clip(np.asarray(x) / s_x, -127, 127)).astype(np.int32)
    want = (x_q @ np.asarray(q, np.int32)) * s_x * np.asarray(scale) + np.asarray(b)
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-5)


def test_static_text_encoder_quant(rng):
    """Calibration -> static W8A8 text encoder: every exercised linear gets
    an act_scale, and the quantized tower tracks the f32 one."""
    from stable_diffusion_tpu.utils import quantize_model as qm
    from stable_diffusion_tpu.utils.torch_interop import flatten_tree

    tcfg = jclip.CLIPTextConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=16, vocab_size=100,
    )
    params = jclip.init_text_model(jax.random.key(0), tcfg)
    batches = [rng.integers(0, 100, size=(2, 16)).astype(np.int32) for _ in range(3)]
    qparams = qm.quantize_text_encoder_static(params, tcfg, batches)

    flat = flatten_tree(qparams)
    act_scales = [k for k in flat if k.endswith("act_scale")]
    kq = [k for k in flat if k.endswith("kernel_q")]
    assert len(act_scales) == len(kq) > 0, (len(act_scales), len(kq))

    ids = jnp.asarray(batches[0])
    base = np.asarray(jclip.text_model_apply(params, ids, tcfg, impl="xla"))
    quant = np.asarray(jclip.text_model_apply(qparams, ids, tcfg, impl="xla"))
    rel = np.abs(quant - base).mean() / (np.abs(base).mean() + 1e-9)
    assert rel < 0.1, rel  # int8 weights AND activations: ~few % drift
    # jitted path compiles and matches the eager quantized result
    import functools
    jit_out = np.asarray(jax.jit(
        functools.partial(jclip.text_model_apply, cfg=tcfg, impl="xla")
    )(qparams, input_ids=ids))
    np.testing.assert_allclose(jit_out, quant, atol=1e-5)


@pytest.mark.heavy
def test_evaluation_cli_main(model_dir, tmp_path, monkeypatch, rng):
    """Drive evaluation.main() through argv — the README's one-command
    real-weights re-measure hook — with the CLIP-score AND CLIP-FID backends
    engaged via a saved tiny HF CLIPModel dir.  Verifies the documented
    argument path end-to-end up to the data itself (inception FID weights
    are the one piece that still needs a real file; the backbone itself is
    parity-tested in tests/test_fid.py)."""
    import json as _json

    from PIL import Image
    from transformers import CLIPConfig, CLIPModel
    from transformers import CLIPTextConfig as HFTextCfg
    from transformers import CLIPVisionConfig as HFVisionCfg

    import evaluation as ev

    # tiny HF CLIPModel dir: 224x224 vision (the scorer resizes to 224),
    # 77-position text (the pipeline tokenizer pads to 77)
    torch.manual_seed(0)
    clip_dir = tmp_path / "clip"
    CLIPModel(CLIPConfig(
        text_config=HFTextCfg(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, max_position_embeddings=77, vocab_size=100,
            hidden_act="quick_gelu", projection_dim=24).to_dict(),
        vision_config=HFVisionCfg(
            hidden_size=40, intermediate_size=80, num_hidden_layers=2,
            num_attention_heads=4, image_size=224, patch_size=56,
            hidden_act="quick_gelu", projection_dim=24).to_dict(),
        projection_dim=24,
    )).save_pretrained(str(clip_dir), safe_serialization=True)

    # synthetic 2-image COCO
    (tmp_path / "imgs").mkdir()
    for i in (1, 2):
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(
            tmp_path / "imgs" / f"{i}.jpg")
    label = {
        "images": [{"id": i, "file_name": f"{i}.jpg"} for i in (1, 2)],
        "annotations": [
            {"image_id": 1, "id": 10, "caption": "a photo of a cat"},
            {"image_id": 2, "id": 20, "caption": "a cat"},
        ],
    }
    lf = tmp_path / "captions.json"
    lf.write_text(_json.dumps(label))

    # keep the sweep tiny and the generates 32x32 (full sweep covered by
    # test_evaluation_sweep; this test owns the ARGV path)
    monkeypatch.setattr(ev, "TEST_CONFIGS",
                        [{"sampler": "ddim", "use_cosine_schedule": False}])
    monkeypatch.setattr(ev, "CFG_SCALES", [3.0])
    from stable_diffusion_tpu.pipeline import StableDiffusion

    orig_gen = StableDiffusion.generate

    def small_gen(self, **kw):
        kw["img_size"] = (32, 32)
        return orig_gen(self, **kw)

    monkeypatch.setattr(StableDiffusion, "generate", small_gen)
    monkeypatch.chdir(tmp_path)  # writer_fn logs into ./runs

    results = ev.main([
        "--model_path", str(model_dir),
        "--tokenizer_dir", str(model_dir / "tokenizer"),
        "--do_cfg", "--sampler", "ddim",
        "--num_inference_steps", "2",
        "--original_imgs_dir", str(tmp_path / "imgs"),
        "--label_file", str(lf),
        "--clip_model_dir", str(clip_dir),
        "--fid_backbone", "clip",
        "--num_samples", "2",
        "--save_dir", str(tmp_path / "out"),
        "--sd_version", "2.1",
        "--seed", "0",
    ])
    tag = "3.0_ddim_linearSchedule"
    assert tag in results and np.isfinite(results[tag])          # CLIP-score
    assert f"{tag}/fid" in results and np.isfinite(results[f"{tag}/fid"])
    out = tmp_path / "out"
    assert (out / "fake" / tag / "1_10.jpg").exists()
    assert (out / "original" / "2_20.jpg").exists()
