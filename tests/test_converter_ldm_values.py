"""Value-level oracle tests for the LDM single-``.ckpt`` converters.

The coverage tests (test_converter.py::test_ldm_checkpoint_covers_model_trees)
check only that every source key is consumed and the output key-set matches our
param trees — a swapped source->target pairing or a wrong transpose would pass
them.  Here we run the REFERENCE loaders themselves (load_weights at
/root/reference/utils/model_converter.py:2744, load_weights_v2 at :1537) on a
synthesized checkpoint whose every tensor has distinct elements (so any
transpose/reshape/chunk by either converter is visible in the values), bridge
the reference's internal output naming to ours with rules written from the
reference OUTPUT naming (independent of the production rules, which are written
from the LDM SOURCE naming), and assert per-tensor equality.

Known, asserted exception: the reference v1 loader never reads the correct
``.attn1.to_{q,k,v}`` sources for 12 transformer blocks (3 encoder.down +
9 decoder.up) and instead fills those 36 q/k/v weights from duplicated wrong
sources (e.g. decoder.up.2.block.0 attn1 <- output_blocks.3, see
test_converter.py:121-130); those names are excluded from the v1 intersection
and pinned as the exact exception set, cross-checked against the v1/v2
source-key diff.  The v2 loader is complete, so the v2 test covers every
attn1 mapping value-level.
"""

import inspect
import re

import numpy as np
import pytest
import torch

from stable_diffusion_tpu.utils import model_converter as mc
from tests import ref

SRC_KEY = re.compile(r"original_model\[['\"]([^'\"]+)['\"]\]")

_VAE_MID_ATTN_W = re.compile(
    r"first_stage_model\.(?:encoder|decoder)\.mid\.attn_1\."
    r"(?:q|k|v|proj_out|to_q|to_k|to_v|to_out\.0)\.weight$"
)
_UNET_PROJ_W = re.compile(
    r"model\.diffusion_model\..*\.(?:proj_in|proj_out)\.weight$"
)


def _source_keys(fn):
    return sorted(set(SRC_KEY.findall(inspect.getsource(fn))))


def _synthesize(keys, version):
    """Distinct-element tensors with shapes that survive each loader's
    transforms: the VAE mid-attention 1x1 convs must reshape to (512, 512)
    (reference :2681 etc.); UNet proj_in/proj_out are rank-4 1x1 convs in
    SD1.x ckpts and rank-2 linears in SD2.x (use_linear_projection)."""
    flat = {}
    for i, k in enumerate(keys):
        if _VAE_MID_ATTN_W.search(k):
            shape = (512, 512, 1, 1)
        elif _UNET_PROJ_W.search(k):
            shape = (2, 3, 1, 1) if version == "1.5" else (2, 3)
        elif k.endswith(".bias"):
            shape = (4,)
        else:
            shape = (2, 3)
        n = int(np.prod(shape))
        flat[k] = (np.arange(n, dtype=np.float32).reshape(shape) % 997.0) + 1000.0 * i
    return flat


def _run_reference(fn, flat, tmp_path):
    path = str(tmp_path / "model.ckpt")
    torch.save({"state_dict": {k: torch.from_numpy(v) for k, v in flat.items()}}, path)
    out = fn(path, device="cpu")
    return {part: {k: v.numpy() for k, v in d.items()} for part, d in out.items()}


# --- name bridge: reference internal naming -> ours ------------------------
# Written from the reference loaders' OUTPUT key grammar (converted['vae'][...]
# strings), NOT from the LDM source naming the production rules use — so a
# production mis-pairing cannot silently satisfy the bridge.

_VAE_RES = {"groupnorm_1": "norm1", "conv_1": "conv1", "groupnorm_2": "norm2",
            "conv_2": "conv2", "proj_input": "conv_shortcut"}
_VAE_ATTN = {"q_proj": "query", "k_proj": "key", "v_proj": "value",
             "out_proj": "proj_attn"}


def _bridge_vae(name):
    m = re.fullmatch(r"encoder\.out\.(\d)\.(weight|bias)", name)
    if m:
        return {"0": "encoder.conv_norm_out", "2": "encoder.conv_out",
                "3": "quant_conv"}[m.group(1)] + "." + m.group(2)
    m = re.fullmatch(r"decoder\.conv_in\.(\d)\.(weight|bias)", name)
    if m:
        return {"0": "post_quant_conv", "1": "decoder.conv_in"}[m.group(1)] + "." + m.group(2)
    m = re.fullmatch(r"decoder\.out\.(\d)\.(weight|bias)", name)
    if m:
        return {"0": "decoder.conv_norm_out", "2": "decoder.conv_out"}[m.group(1)] + "." + m.group(2)
    m = re.fullmatch(r"(encoder|decoder)\.(down|up)\.(\d+)\.block\.(\d+)\.(\w+)\.(weight|bias)", name)
    if m:
        side, du, i, j, leaf, wb = m.groups()
        return f"{side}.{du}_blocks.{i}.resnets.{j}.{_VAE_RES[leaf]}.{wb}"
    m = re.fullmatch(r"encoder\.down\.(\d+)\.downsample\.conv\.(weight|bias)", name)
    if m:
        return f"encoder.down_blocks.{m.group(1)}.downsamplers.0.conv.{m.group(2)}"
    m = re.fullmatch(r"decoder\.up\.(\d+)\.upsample\.conv\.(weight|bias)", name)
    if m:
        return f"decoder.up_blocks.{m.group(1)}.upsamplers.0.conv.{m.group(2)}"
    m = re.fullmatch(r"(encoder|decoder)\.mid\.res_block_([12])\.(\w+)\.(weight|bias)", name)
    if m:
        side, idx, leaf, wb = m.groups()
        return f"{side}.mid_block.resnets.{int(idx) - 1}.{_VAE_RES[leaf]}.{wb}"
    m = re.fullmatch(r"(encoder|decoder)\.mid\.attn_block_1\.groupnorm\.(weight|bias)", name)
    if m:
        return f"{m.group(1)}.mid_block.attentions.0.group_norm.{m.group(2)}"
    m = re.fullmatch(r"(encoder|decoder)\.mid\.attn_block_1\.attn\.(\w+)\.(weight|bias)", name)
    if m:
        return f"{m.group(1)}.mid_block.attentions.0.{_VAE_ATTN[m.group(2)]}.{m.group(3)}"
    if re.fullmatch(r"encoder\.conv_in\.(weight|bias)", name):
        return name
    raise KeyError(f"unbridged reference VAE key: {name}")


def _bridge_text(name):
    m = re.fullmatch(r"encoder_layers\.(\d+)\.layernorm_([12])\.(weight|bias)", name)
    if m:
        return f"encoder.layers.{m.group(1)}.layer_norm{m.group(2)}.{m.group(3)}"
    m = re.fullmatch(r"encoder_layers\.(\d+)\.ffn\.([02])\.(weight|bias)", name)
    if m:
        fc = {"0": "fc1", "2": "fc2"}[m.group(2)]
        return f"encoder.layers.{m.group(1)}.mlp.{fc}.{m.group(3)}"
    m = re.fullmatch(r"encoder_layers\.(\d+)\.self_attn\.(\w+)\.(weight|bias)", name)
    if m:
        return f"encoder.layers.{m.group(1)}.self_attn.{m.group(2)}.{m.group(3)}"
    if name == "text_embedding.embedding.weight":
        return "embeddings.token_embedding.weight"
    if name in ("text_embedding.position_embedding.weight",
                "text_embedding.positional_encoding"):  # v1 / v2 spelling
        return "embeddings.position_embedding.weight"
    if name.startswith("final_layer_norm."):
        return name
    raise KeyError(f"unbridged reference text key: {name}")


def _norm(a):
    """Collapse trailing 1x1 conv dims so the unified-tree conv form and the
    reference's rank-2 form compare directly (the values must still match
    element-for-element in (out, in) order)."""
    if a.ndim == 4 and a.shape[2:] == (1, 1):
        return a.reshape(a.shape[0], a.shape[1])
    return a


def _assert_part_equal(ours, theirs, bridge, part):
    assert set(ours) == {bridge(k) for k in theirs}, f"{part}: key-set mismatch"
    for k, v in theirs.items():
        np.testing.assert_array_equal(
            _norm(ours[bridge(k)]), _norm(v),
            err_msg=f"{part}: {k} -> {bridge(k)}",
        )


# The reference v1 loader's known wrong/duplicated attn1 sources: 12
# transformer blocks (encoder.down.{0,1,2} + decoder.up.{1,2,3}) whose attn1
# q/k/v weights it fills from duplicated reads of OTHER blocks' sources
# because the correct `.attn1.to_{q,k,v}.weight` keys are absent from its
# source spec — 12 blocks x 3 tensors = 36, the exact v1/v2 source-spec diff
# (asserted below against that diff, not just this shape).
_V1_ATTN1_BUG = re.compile(
    r"(?:encoder\.down|decoder\.up)\.\d+\.block\.\d+\.1"
    r"\.transformer_block\.attn1\.[qkv]_proj\.weight$"
)


def test_ldm_v1_values_vs_reference(tmp_path):
    rmc = ref.load("utils.model_converter")
    keys = _source_keys(rmc.load_weights)
    assert len(keys) > 1000
    flat = _synthesize(keys, "1.5")
    want = _run_reference(rmc.load_weights, flat, tmp_path)
    got = mc.convert_ldm_checkpoint(flat, sd_version="1.5")

    # UNet naming is shared (our models keep the reference's internal names):
    # ours must be a subset with equal values; the reference's extra keys must
    # be exactly its documented attn1-duplication bug.
    ours, theirs = got["unet"], want["unet"]
    extra = set(theirs) - set(ours)
    assert not (set(ours) - set(theirs))
    assert extra and all(_V1_ATTN1_BUG.search(k) for k in sorted(extra)), sorted(extra)
    # Cross-check the exception set against the v1/v2 source-spec diff: the
    # v1 loader is missing the correct .attn1.to_{q,k,v} sources for 13
    # blocks (39 keys); it back-fills 12 of those blocks (36 tensors) from
    # duplicated wrong reads and leaves ONE block's attn1 q/k/v entirely
    # unassigned (45 of the topology's 48 attn1 qkv weights appear at all).
    v2_only = {k for k in _source_keys(rmc.load_weights_v2)
               if k.startswith("model.diffusion_model.")} - set(keys)
    assert len(extra) == 36 and len(v2_only) == 39, (len(extra), len(v2_only))
    n_attn1_qkv = sum(1 for k in theirs
                      if re.search(r"\.attn1\.[qkv]_proj\.weight$", k))
    assert n_attn1_qkv == 45, n_attn1_qkv
    # ...and each of those is indeed a duplicated read the v1 loader also
    # assigned somewhere else (the bug signature), not a mapping we lost
    by_tag = {}
    for k, v in theirs.items():
        by_tag.setdefault(int(v.flat[0] // 1000), []).append(k)
    for k in extra:
        tag = int(theirs[k].flat[0] // 1000)
        assert len(by_tag[tag]) > 1, f"{k}: unique source — not the known duplication bug"
    for k in ours:
        np.testing.assert_array_equal(_norm(ours[k]), _norm(theirs[k]), err_msg=f"unet: {k}")

    _assert_part_equal(got["vae"], want["vae"], _bridge_vae, "vae")
    _assert_part_equal(got["text_encoder"], want["cond_encoder"], _bridge_text, "text")


def test_ldm_v2_values_vs_reference(tmp_path):
    rmc = ref.load("utils.model_converter")
    keys = _source_keys(rmc.load_weights_v2)
    assert len(keys) > 1000
    flat = _synthesize(keys, "2.1")
    want = _run_reference(rmc.load_weights_v2, flat, tmp_path)
    got = mc.convert_ldm_checkpoint(flat, sd_version="2.1")

    ours, theirs = got["unet"], want["unet"]
    assert set(ours) == set(theirs), (
        sorted(set(ours) ^ set(theirs))[:10]
    )
    for k in ours:
        np.testing.assert_array_equal(_norm(ours[k]), _norm(theirs[k]), err_msg=f"unet: {k}")

    _assert_part_equal(got["vae"], want["vae"], _bridge_vae, "vae")
    _assert_part_equal(got["text_encoder"], want["cond_encoder"], _bridge_text, "text")


def test_ldm_v1_union_fills_the_reference_gap():
    """Our converter takes the union of both loaders' diffusion_model specs
    (test_converter.py:121-130): fed the sources the v1 loader MISSES, it must
    fill the corresponding attn1 weights from the correctly-named source —
    the mapping the v2 value test verifies against the complete v2 loader."""
    rmc = ref.load("utils.model_converter")
    v1 = set(_source_keys(rmc.load_weights))
    v2 = {k for k in _source_keys(rmc.load_weights_v2)
          if k.startswith("model.diffusion_model.")}
    missing = sorted(v2 - v1)
    assert missing, "reference v1 loader no longer missing sources?"
    assert all(".attn1.to_" in k for k in missing)
    flat = _synthesize(sorted(v1 | v2), "1.5")
    got = mc.convert_ldm_checkpoint(flat, sd_version="1.5")["unet"]
    # every missing source must land somewhere in our output, value-intact
    out_tags = {int(v.flat[0] // 1000) for v in got.values()}
    keys_sorted = sorted(v1 | v2)
    for k in missing:
        assert keys_sorted.index(k) in out_tags, f"union source {k} not consumed"
