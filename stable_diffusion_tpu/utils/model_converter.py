"""Checkpoint-format interop: the 6 formats of the reference's 4,761-line
``utils/model_converter.py``, as data-driven rules.

| loader                      | source format                                | reference        |
|-----------------------------|----------------------------------------------|------------------|
| load_unet_diffusers         | diffusers SD1.5/2.1 UNet safetensors         | :49-791 / :793-1535 |
| load_vae_diffusers          | diffusers VAE (old query/key/value naming OR
|                             | newer to_q/to_k/to_v "swiftbrush" naming)    | vae.py:276-287, :6-47 |
| load_text_encoder_diffusers | HF CLIPTextModel safetensors                 | openclip.py:145-157 |
| load_ldm_checkpoint         | original-LDM SD1.x / SD2.x single .ckpt      | :2744-3940 / :1537-2742 |
| load_lora_kohya             | kohya LoRA safetensors (lora_te_*/lora_unet_*)| :3942-4761      |

Pipeline: read tensors (safetensors numpy or torch.load) -> rename keys to
our reference-mirroring paths via regex rules (+ per-tensor transforms like
1x1-linear->conv expansion and fused-qkv splitting) -> ingest through
``torch_interop.from_torch_state_dict`` (which applies the OIHW->HWIO /
(out,in)->(in,out) layout transposes).

The reference's two LDM loaders emit *demo-stack* key names; ours emit the
single unified naming (SURVEY section 1: "the new framework must provide ONE
stack").  Parity for the diffusers/kohya formats is tested key-by-key
against the reference's own unrolled loaders (tests/test_converter.py).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Iterable, List, Optional, Tuple

import numpy as np

from stable_diffusion_tpu.utils.torch_interop import from_torch_state_dict

# ---------------------------------------------------------------------------
# IO
# ---------------------------------------------------------------------------


def read_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np", device="cpu") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def read_torch_ckpt(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def read_checkpoint(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        return read_safetensors(path)
    return read_torch_ckpt(path)


# ---------------------------------------------------------------------------
# Rule engine
# ---------------------------------------------------------------------------

Rule = Tuple[re.Pattern, str, Optional[Callable[[np.ndarray], np.ndarray]]]


def _compile(rules: Iterable[Tuple[str, str]]) -> List[Rule]:
    out = []
    for r in rules:
        pat, repl = r[0], r[1]
        fn = r[2] if len(r) > 2 else None
        out.append((re.compile(pat), repl, fn))
    return out


def remap(
    flat: Dict[str, np.ndarray],
    rules: List[Rule],
    *,
    skip: Iterable[re.Pattern] = (),
    strict: bool = True,
) -> Dict[str, np.ndarray]:
    """Apply the first full-matching rule to each key.  Unmatched keys raise
    (strict) so silently-dropped weights are impossible."""
    out: Dict[str, np.ndarray] = {}
    unmatched = []
    for key, val in flat.items():
        if any(s.fullmatch(key) for s in skip):
            continue
        for pat, repl, fn in rules:
            m = pat.fullmatch(key)
            if m:
                out[m.expand(repl)] = fn(val) if fn else val
                break
        else:
            unmatched.append(key)
    if unmatched and strict:
        raise KeyError(f"{len(unmatched)} unmatched keys, e.g. {unmatched[:5]}")
    return out


def _as_conv1x1(w: np.ndarray) -> np.ndarray:
    """rank-2 linear (out, in) -> 1x1 conv OIHW (SD2.1 use_linear_projection;
    the reference's [:, :, None, None] at model_converter.py:822 etc.)."""
    return w[:, :, None, None] if w.ndim == 2 else w


def _squeeze_conv(w: np.ndarray) -> np.ndarray:
    """1x1 conv OIHW -> linear (out, in) (CompVis VAE attention; the
    reference's .reshape((512, 512)) at model_converter.py:2681)."""
    return w.reshape(w.shape[0], w.shape[1]) if w.ndim == 4 else w


# ---------------------------------------------------------------------------
# Diffusers UNet -> unified naming (reference :49-791 and :793-1535)
# ---------------------------------------------------------------------------

_RES = r"(?:norm1|conv1|time_emb_proj|norm2|conv2|conv_shortcut)"
_RES_MAP = {
    "norm1": "groupnorm_1",
    "conv1": "conv_1",
    "time_emb_proj": "t_embed",
    "norm2": "groupnorm_2",
    "conv2": "conv_2",
    "conv_shortcut": "proj_input",
}


def _res(m_name: str) -> str:
    return _RES_MAP[m_name]


def _unet_rules() -> List[Rule]:
    # attention-block inner renames shared by down/mid/up
    attn_inner = [
        (r"norm\.(weight|bias)", r"groupnorm.\1", None),
        (r"proj_in\.weight", r"conv_input.weight", _as_conv1x1),
        (r"proj_in\.bias", r"conv_input.bias", None),
        (r"proj_out\.weight", r"conv_output.weight", _as_conv1x1),
        (r"proj_out\.bias", r"conv_output.bias", None),
        (r"transformer_blocks\.0\.norm1\.(weight|bias)", r"transformer_block.layernorm_1.\1", None),
        (r"transformer_blocks\.0\.norm2\.(weight|bias)", r"transformer_block.layernorm_2.\1", None),
        (r"transformer_blocks\.0\.norm3\.(weight|bias)", r"transformer_block.layernorm_3.\1", None),
        (r"transformer_blocks\.0\.attn(\d)\.to_q\.(weight|bias)", r"transformer_block.attn\1.q_proj.\2", None),
        (r"transformer_blocks\.0\.attn(\d)\.to_k\.(weight|bias)", r"transformer_block.attn\1.k_proj.\2", None),
        (r"transformer_blocks\.0\.attn(\d)\.to_v\.(weight|bias)", r"transformer_block.attn\1.v_proj.\2", None),
        (r"transformer_blocks\.0\.attn(\d)\.to_out\.0\.(weight|bias)", r"transformer_block.attn\1.out_proj.\2", None),
        (r"transformer_blocks\.0\.ff\.net\.0\.proj\.(weight|bias)", r"transformer_block.ffn.0.proj.\1", None),
        (r"transformer_blocks\.0\.ff\.net\.2\.(weight|bias)", r"transformer_block.ffn.1.\1", None),
    ]

    rules: List[Tuple] = [
        (r"time_embedding\.linear_1\.(weight|bias)", r"time_embedding.ffn.0.\1"),
        (r"time_embedding\.linear_2\.(weight|bias)", r"time_embedding.ffn.2.\1"),
        (r"conv_in\.(weight|bias)", r"encoder.conv_in.\1"),
        (r"conv_norm_out\.(weight|bias)", r"output.0.\1"),
        (r"conv_out\.(weight|bias)", r"output.2.\1"),
        (r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(weight|bias)", r"encoder.down.\1.downsample.conv.\2"),
        (r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.(weight|bias)", r"decoder.up.\1.upsample.conv.\2"),
    ]
    for name, target in _RES_MAP.items():
        rules += [
            (rf"down_blocks\.(\d+)\.resnets\.(\d+)\.{name}\.(weight|bias)",
             rf"encoder.down.\1.block.\2.0.{target}.\3"),
            (rf"up_blocks\.(\d+)\.resnets\.(\d+)\.{name}\.(weight|bias)",
             rf"decoder.up.\1.block.\2.0.{target}.\3"),
            (rf"mid_block\.resnets\.0\.{name}\.(weight|bias)", rf"bottleneck.0.{target}.\1"),
            (rf"mid_block\.resnets\.1\.{name}\.(weight|bias)", rf"bottleneck.2.{target}.\1"),
        ]
    for pat, repl, fn in _compile(attn_inner):
        rules += [
            (rf"down_blocks\.(\d+)\.attentions\.(\d+)\.{pat.pattern}",
             r"encoder.down.\1.block.\2.1." + re.sub(r"\\(\d)", lambda m: "\\" + str(int(m.group(1)) + 2), repl),
             fn),
            (rf"up_blocks\.(\d+)\.attentions\.(\d+)\.{pat.pattern}",
             r"decoder.up.\1.block.\2.1." + re.sub(r"\\(\d)", lambda m: "\\" + str(int(m.group(1)) + 2), repl),
             fn),
            (rf"mid_block\.attentions\.0\.{pat.pattern}", "bottleneck.1." + repl, fn),
        ]
    return _compile(rules)


_UNET_RULES = _unet_rules()


def convert_unet_diffusers(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return remap(flat, _UNET_RULES)


def load_unet_diffusers(path: str, *, sd_version: str = "1.5", dtype=None):
    """sd_version only affects shapes/ranks in the source file; the rule set
    covers both (the reference unrolls two near-identical functions)."""
    return from_torch_state_dict(convert_unet_diffusers(read_checkpoint(path)), dtype=dtype)


# ---------------------------------------------------------------------------
# Diffusers VAE (reference vae.py:276-287 + swiftbrush remap :6-47)
# ---------------------------------------------------------------------------

_VAE_SWIFTBRUSH_RULES = _compile([
    (r"(encoder|decoder)\.mid_block\.attentions\.0\.to_q\.(weight|bias)", r"\1.mid_block.attentions.0.query.\2"),
    (r"(encoder|decoder)\.mid_block\.attentions\.0\.to_k\.(weight|bias)", r"\1.mid_block.attentions.0.key.\2"),
    (r"(encoder|decoder)\.mid_block\.attentions\.0\.to_v\.(weight|bias)", r"\1.mid_block.attentions.0.value.\2"),
    (r"(encoder|decoder)\.mid_block\.attentions\.0\.to_out\.0\.(weight|bias)", r"\1.mid_block.attentions.0.proj_attn.\2"),
    (r"(.*)", r"\1"),
])


def convert_vae_diffusers(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Stock diffusers VAE naming equals ours; newer checkpoints (swiftbrush)
    use to_q/to_k/to_v and need the rename."""
    return remap(flat, _VAE_SWIFTBRUSH_RULES)


def load_vae_diffusers(path: str, *, dtype=None):
    return from_torch_state_dict(convert_vae_diffusers(read_checkpoint(path)), dtype=dtype)


def load_text_encoder_diffusers(path: str, *, dtype=None):
    """HF CLIPTextModel naming == ours rooted at text_model.*; strips the
    root and drops position_ids (reference openclip.py:150-152)."""
    flat = read_checkpoint(path)
    flat = {k[len("text_model."):] if k.startswith("text_model.") else k: v for k, v in flat.items()}
    return from_torch_state_dict(flat, dtype=dtype)


# ---------------------------------------------------------------------------
# Original-LDM single .ckpt (SD 1.x: reference :2744-3940; SD 2.x: :1537-2742)
# ---------------------------------------------------------------------------

_LDM_SKIP = [re.compile(p) for p in (
    r"model_ema\..*", r"alphas_cumprod.*", r"betas", r"alphas.*", r"sqrt_.*",
    r"log_one_minus.*", r"posterior_.*", r"v_posterior.*", r".*\.num_batches_tracked",
    r"cond_stage_model\.model\.text_projection", r"cond_stage_model\.model\.logit_scale",
    r"cond_stage_model\.transformer\.text_model\.embeddings\.position_ids",
    r"first_stage_model\.loss\..*", r"logvar",
    # open_clip ships 24 resblocks; SD2.1 uses the penultimate layer, so the
    # HF conversion (and our 23-layer config) drops resblock 23
    r"cond_stage_model\.model\.transformer\.resblocks\.23\..*",
    r"model\.diffusion_model\.label_emb\..*",
)]


def _ldm_unet_rules() -> List[Rule]:
    p = r"model\.diffusion_model\."
    res_inner = [
        (r"in_layers\.0", "groupnorm_1", None),
        (r"in_layers\.2", "conv_1", None),
        (r"emb_layers\.1", "t_embed", None),
        (r"out_layers\.0", "groupnorm_2", None),
        (r"out_layers\.3", "conv_2", None),
        (r"skip_connection", "proj_input", None),
    ]
    attn_inner = [
        (r"norm", "groupnorm", None),
        (r"proj_in", "conv_input", _as_conv1x1),
        (r"proj_out", "conv_output", _as_conv1x1),
        (r"transformer_blocks\.0\.norm1", "transformer_block.layernorm_1", None),
        (r"transformer_blocks\.0\.norm2", "transformer_block.layernorm_2", None),
        (r"transformer_blocks\.0\.norm3", "transformer_block.layernorm_3", None),
        (r"transformer_blocks\.0\.attn1\.to_q", "transformer_block.attn1.q_proj", None),
        (r"transformer_blocks\.0\.attn1\.to_k", "transformer_block.attn1.k_proj", None),
        (r"transformer_blocks\.0\.attn1\.to_v", "transformer_block.attn1.v_proj", None),
        (r"transformer_blocks\.0\.attn1\.to_out\.0", "transformer_block.attn1.out_proj", None),
        (r"transformer_blocks\.0\.attn2\.to_q", "transformer_block.attn2.q_proj", None),
        (r"transformer_blocks\.0\.attn2\.to_k", "transformer_block.attn2.k_proj", None),
        (r"transformer_blocks\.0\.attn2\.to_v", "transformer_block.attn2.v_proj", None),
        (r"transformer_blocks\.0\.attn2\.to_out\.0", "transformer_block.attn2.out_proj", None),
        (r"transformer_blocks\.0\.ff\.net\.0\.proj", "transformer_block.ffn.0.proj", None),
        (r"transformer_blocks\.0\.ff\.net\.2", "transformer_block.ffn.1", None),
    ]
    rules: List[Tuple] = [
        (p + r"time_embed\.0\.(weight|bias)", r"unet\.time_embedding.ffn.0.\1".replace(r"\.", ".")),
        (p + r"time_embed\.2\.(weight|bias)", r"unet.time_embedding.ffn.2.\1"),
        (p + r"input_blocks\.0\.0\.(weight|bias)", r"unet.encoder.conv_in.\1"),
        (p + r"out\.0\.(weight|bias)", r"unet.output.0.\1"),
        (p + r"out\.2\.(weight|bias)", r"unet.output.2.\1"),
    ]
    # fix the accidental escape above
    rules[0] = (p + r"time_embed\.0\.(weight|bias)", r"unet.time_embedding.ffn.0.\1")

    # encoder: input_blocks n=1..11; resnet index (n-1): stage (n-1)//3, block (n-1)%3
    for n in range(1, 12):
        i, j = (n - 1) // 3, (n - 1) % 3
        if j == 2:  # downsample block (n = 3, 6, 9)
            rules.append(
                (p + rf"input_blocks\.{n}\.0\.op\.(weight|bias)",
                 rf"unet.encoder.down.{i}.downsample.conv.\1")
            )
            continue
        for pat, tgt, fn in res_inner:
            rules.append(
                (p + rf"input_blocks\.{n}\.0\.{pat}\.(weight|bias)",
                 rf"unet.encoder.down.{i}.block.{j}.0.{tgt}.\1", fn)
            )
        for pat, tgt, fn in attn_inner:
            rules.append(
                (p + rf"input_blocks\.{n}\.1\.{pat}\.(weight|bias)",
                 rf"unet.encoder.down.{i}.block.{j}.1.{tgt}.\1", fn)
            )
    # bottleneck
    for pat, tgt, fn in res_inner:
        rules.append((p + rf"middle_block\.0\.{pat}\.(weight|bias)", rf"unet.bottleneck.0.{tgt}.\1", fn))
        rules.append((p + rf"middle_block\.2\.{pat}\.(weight|bias)", rf"unet.bottleneck.2.{tgt}.\1", fn))
    for pat, tgt, fn in attn_inner:
        rules.append((p + rf"middle_block\.1\.{pat}\.(weight|bias)", rf"unet.bottleneck.1.{tgt}.\1", fn))
    # decoder: output_blocks n=0..11: stage n//3, block n%3; upsample at the
    # end of stages 0..2 lives at module index 1 (no-attn stage) or 2
    for n in range(12):
        i, j = n // 3, n % 3
        for pat, tgt, fn in res_inner:
            rules.append(
                (p + rf"output_blocks\.{n}\.0\.{pat}\.(weight|bias)",
                 rf"unet.decoder.up.{i}.block.{j}.0.{tgt}.\1", fn)
            )
        for pat, tgt, fn in attn_inner:
            rules.append(
                (p + rf"output_blocks\.{n}\.1\.{pat}\.(weight|bias)",
                 rf"unet.decoder.up.{i}.block.{j}.1.{tgt}.\1", fn)
            )
        if j == 2 and i < 3:
            rules.append(
                (p + rf"output_blocks\.{n}\.[12]\.conv\.(weight|bias)",
                 rf"unet.decoder.up.{i}.upsample.conv.\1")
            )
    return _compile(rules)


def _ldm_vae_rules() -> List[Rule]:
    p = r"first_stage_model\."
    rules: List[Tuple] = [
        (r"quant_conv\.(weight|bias)", r"vae.quant_conv.\1"),
        (r"post_quant_conv\.(weight|bias)", r"vae.post_quant_conv.\1"),
    ]
    rules = [(p + a, b) for a, b in rules]
    for side in ("encoder", "decoder"):
        sp = p + side + r"\."
        t = f"vae.{side}."
        rules += [
            (sp + r"conv_in\.(weight|bias)", t + r"conv_in.\1"),
            (sp + r"conv_out\.(weight|bias)", t + r"conv_out.\1"),
            (sp + r"norm_out\.(weight|bias)", t + r"conv_norm_out.\1"),
            # mid
            (sp + r"mid\.block_1\.(norm1|conv1|norm2|conv2)\.(weight|bias)", t + r"mid_block.resnets.0.\1.\2"),
            (sp + r"mid\.block_2\.(norm1|conv1|norm2|conv2)\.(weight|bias)", t + r"mid_block.resnets.1.\1.\2"),
            (sp + r"mid\.block_1\.nin_shortcut\.(weight|bias)", t + r"mid_block.resnets.0.conv_shortcut.\1"),
            (sp + r"mid\.block_2\.nin_shortcut\.(weight|bias)", t + r"mid_block.resnets.1.conv_shortcut.\1"),
            (sp + r"mid\.attn_1\.norm\.(weight|bias)", t + r"mid_block.attentions.0.group_norm.\1"),
            (sp + r"mid\.attn_1\.(?:q|to_q)\.(weight|bias)", t + r"mid_block.attentions.0.query.\1", _squeeze_conv),
            (sp + r"mid\.attn_1\.(?:k|to_k)\.(weight|bias)", t + r"mid_block.attentions.0.key.\1", _squeeze_conv),
            (sp + r"mid\.attn_1\.(?:v|to_v)\.(weight|bias)", t + r"mid_block.attentions.0.value.\1", _squeeze_conv),
            (sp + r"mid\.attn_1\.(?:proj_out|to_out\.0)\.(weight|bias)", t + r"mid_block.attentions.0.proj_attn.\1", _squeeze_conv),
        ]
    # encoder stages: CompVis encoder.down.{i}.block.{j}
    rules += [
        (p + r"encoder\.down\.(\d+)\.block\.(\d+)\.(norm1|conv1|norm2|conv2)\.(weight|bias)",
         r"vae.encoder.down_blocks.\1.resnets.\2.\3.\4"),
        (p + r"encoder\.down\.(\d+)\.block\.(\d+)\.nin_shortcut\.(weight|bias)",
         r"vae.encoder.down_blocks.\1.resnets.\2.conv_shortcut.\3"),
        (p + r"encoder\.down\.(\d+)\.downsample\.conv\.(weight|bias)",
         r"vae.encoder.down_blocks.\1.downsamplers.0.conv.\2"),
    ]
    # decoder stages: CompVis up index is reversed (up.3 applied first; ours
    # up_blocks.0 is the deepest)
    for c in range(4):
        ours = 3 - c
        rules += [
            (p + rf"decoder\.up\.{c}\.block\.(\d+)\.(norm1|conv1|norm2|conv2)\.(weight|bias)",
             rf"vae.decoder.up_blocks.{ours}.resnets.\1.\2.\3"),
            (p + rf"decoder\.up\.{c}\.block\.(\d+)\.nin_shortcut\.(weight|bias)",
             rf"vae.decoder.up_blocks.{ours}.resnets.\1.conv_shortcut.\2"),
            (p + rf"decoder\.up\.{c}\.upsample\.conv\.(weight|bias)",
             rf"vae.decoder.up_blocks.{ours}.upsamplers.0.conv.\1"),
        ]
    return _compile(rules)


def _chunk3(idx: int):
    def fn(w: np.ndarray) -> np.ndarray:
        return np.split(w, 3, axis=0)[idx]

    return fn


def _ldm_text_rules_v1() -> List[Rule]:
    """SD 1.x: cond_stage_model.transformer.text_model.* is HF CLIP naming."""
    return _compile([
        (r"cond_stage_model\.transformer\.text_model\.(.*)", r"text_encoder.\1"),
    ])


def _ldm_text_rules_v2() -> List[Rule]:
    """SD 2.x: cond_stage_model.model.* is open_clip naming; the fused
    attn.in_proj splits into q/k/v (chunk 3 on the out dim)."""
    p = r"cond_stage_model\.model\."
    t = "text_encoder."
    rules: List[Tuple] = [
        (p + r"token_embedding\.weight", t + "embeddings.token_embedding.weight"),
        (p + r"positional_embedding", t + "embeddings.position_embedding.weight"),
        (p + r"ln_final\.(weight|bias)", t + r"final_layer_norm.\1"),
        (p + r"transformer\.resblocks\.(\d+)\.ln_1\.(weight|bias)", t + r"encoder.layers.\1.layer_norm1.\2"),
        (p + r"transformer\.resblocks\.(\d+)\.ln_2\.(weight|bias)", t + r"encoder.layers.\1.layer_norm2.\2"),
        (p + r"transformer\.resblocks\.(\d+)\.attn\.out_proj\.(weight|bias)", t + r"encoder.layers.\1.self_attn.out_proj.\2"),
        (p + r"transformer\.resblocks\.(\d+)\.mlp\.c_fc\.(weight|bias)", t + r"encoder.layers.\1.mlp.fc1.\2"),
        (p + r"transformer\.resblocks\.(\d+)\.mlp\.c_proj\.(weight|bias)", t + r"encoder.layers.\1.mlp.fc2.\2"),
    ]
    for idx, name in enumerate(("q_proj", "k_proj", "v_proj")):
        rules.append(
            (p + r"transformer\.resblocks\.(\d+)\.attn\.in_proj_weight",
             t + rf"encoder.layers.\1.self_attn.{name}.weight", _chunk3(idx))
        )
        rules.append(
            (p + r"transformer\.resblocks\.(\d+)\.attn\.in_proj_bias",
             t + rf"encoder.layers.\1.self_attn.{name}.bias", _chunk3(idx))
        )
    return rules and _compile(rules)


_LDM_UNET_RULES = _ldm_unet_rules()
_LDM_VAE_RULES = _ldm_vae_rules()
_LDM_TEXT_V1 = _ldm_text_rules_v1()
_LDM_TEXT_V2 = _ldm_text_rules_v2()


def convert_ldm_checkpoint(flat: Dict[str, np.ndarray], *, sd_version: str = "1.5"):
    """Single CompVis/LDM .ckpt -> {"unet", "vae", "text_encoder"} flat dicts
    in our unified naming (still torch-layout tensors).

    NOTE on fused in_proj (v2): the split duplicates the source key across
    q/k/v rules, so we run three passes restricted to those keys.

    Text tower: both namings are accepted regardless of sd_version — raw
    SD2.x ckpts carry open_clip keys (cond_stage_model.model.*), while the
    reference's load_weights_v2 only handles ckpts whose text tower was
    already renamed to the HF style (cond_stage_model.transformer.*,
    model_converter.py:1537+ never reads cond_stage_model.model.*); we
    support the superset.
    """
    del sd_version  # both UNet prj ranks and both text namings are handled
    out: Dict[str, np.ndarray] = {}
    unmatched = []
    for key, val in flat.items():
        if any(s.fullmatch(key) for s in _LDM_SKIP):
            continue
        hits = 0
        for rules in (_LDM_UNET_RULES, _LDM_VAE_RULES, _LDM_TEXT_V1, _LDM_TEXT_V2):
            for pat, repl, fn in rules:
                m = pat.fullmatch(key)
                if m:
                    out[m.expand(repl)] = fn(val) if fn else val
                    hits += 1
                    # in_proj must hit all three q/k/v rules; others stop
                    if "in_proj" not in key:
                        break
            if hits and "in_proj" not in key:
                break
        if not hits:
            unmatched.append(key)
    if unmatched:
        raise KeyError(f"{len(unmatched)} unmatched LDM keys, e.g. {unmatched[:8]}")

    split: Dict[str, Dict[str, np.ndarray]] = {"unet": {}, "vae": {}, "text_encoder": {}}
    for k, v in out.items():
        root, rest = k.split(".", 1)
        split[root][rest] = v
    return split


def load_ldm_checkpoint(path: str, *, sd_version: str = "1.5", dtype=None):
    """-> {"unet", "vae", "text_encoder"} param pytrees (reference
    load_weights :2744 / load_weights_v2 :1537)."""
    split = convert_ldm_checkpoint(read_checkpoint(path), sd_version=sd_version)
    return {k: from_torch_state_dict(v, dtype=dtype) for k, v in split.items()}


# ---------------------------------------------------------------------------
# kohya LoRA safetensors (reference :3942-4761)
# ---------------------------------------------------------------------------

_KOHYA_UNET = _compile([
    (r"lora_unet_down_blocks_(\d+)_attentions_(\d+)_transformer_blocks_0_attn(\d)_to_(q|k|v)",
     r"encoder.down.\1.block.\2.1.transformer_block.attn\3.\4_proj"),
    (r"lora_unet_down_blocks_(\d+)_attentions_(\d+)_transformer_blocks_0_attn(\d)_to_out_0",
     r"encoder.down.\1.block.\2.1.transformer_block.attn\3.out_proj"),
    (r"lora_unet_down_blocks_(\d+)_attentions_(\d+)_transformer_blocks_0_ff_net_0_proj",
     r"encoder.down.\1.block.\2.1.transformer_block.ffn.0.proj"),
    (r"lora_unet_down_blocks_(\d+)_attentions_(\d+)_transformer_blocks_0_ff_net_2",
     r"encoder.down.\1.block.\2.1.transformer_block.ffn.1"),
    (r"lora_unet_down_blocks_(\d+)_attentions_(\d+)_proj_in", r"encoder.down.\1.block.\2.1.conv_input"),
    # some kohya exports name the attention-level proj_out "out_proj"
    # (the reference maps it at model_converter.py:4174-4176)
    (r"lora_unet_down_blocks_(\d+)_attentions_(\d+)_(?:proj_out|out_proj)", r"encoder.down.\1.block.\2.1.conv_output"),
    (r"lora_unet_up_blocks_(\d+)_attentions_(\d+)_transformer_blocks_0_attn(\d)_to_(q|k|v)",
     r"decoder.up.\1.block.\2.1.transformer_block.attn\3.\4_proj"),
    (r"lora_unet_up_blocks_(\d+)_attentions_(\d+)_transformer_blocks_0_attn(\d)_to_out_0",
     r"decoder.up.\1.block.\2.1.transformer_block.attn\3.out_proj"),
    (r"lora_unet_up_blocks_(\d+)_attentions_(\d+)_transformer_blocks_0_ff_net_0_proj",
     r"decoder.up.\1.block.\2.1.transformer_block.ffn.0.proj"),
    (r"lora_unet_up_blocks_(\d+)_attentions_(\d+)_transformer_blocks_0_ff_net_2",
     r"decoder.up.\1.block.\2.1.transformer_block.ffn.1"),
    (r"lora_unet_up_blocks_(\d+)_attentions_(\d+)_proj_in", r"decoder.up.\1.block.\2.1.conv_input"),
    (r"lora_unet_up_blocks_(\d+)_attentions_(\d+)_(?:proj_out|out_proj)", r"decoder.up.\1.block.\2.1.conv_output"),
    (r"lora_unet_mid_block_attentions_0_transformer_blocks_0_attn(\d)_to_(q|k|v)",
     r"bottleneck.1.transformer_block.attn\1.\2_proj"),
    (r"lora_unet_mid_block_attentions_0_transformer_blocks_0_attn(\d)_to_out_0",
     r"bottleneck.1.transformer_block.attn\1.out_proj"),
    (r"lora_unet_mid_block_attentions_0_transformer_blocks_0_ff_net_0_proj",
     r"bottleneck.1.transformer_block.ffn.0.proj"),
    (r"lora_unet_mid_block_attentions_0_transformer_blocks_0_ff_net_2",
     r"bottleneck.1.transformer_block.ffn.1"),
    (r"lora_unet_mid_block_attentions_0_proj_in", r"bottleneck.1.conv_input"),
    (r"lora_unet_mid_block_attentions_0_(?:proj_out|out_proj)", r"bottleneck.1.conv_output"),
])

_KOHYA_TEXT = _compile([
    (r"lora_te_text_model_encoder_layers_(\d+)_self_attn_(q|k|v|out)_proj",
     r"encoder.layers.\1.self_attn.\2_proj"),
    (r"lora_te_text_model_encoder_layers_(\d+)_mlp_fc(\d)", r"encoder.layers.\1.mlp.fc\2"),
])


def load_lora_kohya(path: str, *, reference_scale_convention: bool = False):
    """kohya LoRA safetensors -> {"unet": lora_tree, "text_encoder": lora_tree}
    keyed by our param paths: {path: {lora_A (out,r), lora_B (r,in), alpha}}.

    kohya semantics: effective scale = alpha / rank.  Our merge computes
    rank / alpha (the reference's inverted convention, models/lora.py:10), so
    by default we store alpha' = rank^2 / alpha_kohya, making
    rank/alpha' == alpha_kohya/rank (kohya-correct output).
    ``reference_scale_convention=True`` stores alpha verbatim instead,
    matching the reference loader (model_converter.py:3952...) bug-for-bug.
    """
    flat = read_checkpoint(path)
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for key, val in flat.items():
        if key.endswith(".alpha"):
            base, leaf = key[: -len(".alpha")], "alpha"
        else:  # <module>.lora_up.weight / <module>.lora_down.weight
            base, mid, last = key.rsplit(".", 2)
            leaf = f"{mid}.{last}"
        groups.setdefault(base, {})[leaf] = val

    out = {"unet": {}, "text_encoder": {}}
    unmatched = []
    for base, tensors in groups.items():
        target, rules = ("unet", _KOHYA_UNET) if base.startswith("lora_unet_") else ("text_encoder", _KOHYA_TEXT)
        for pat, repl, _ in rules:
            m = pat.fullmatch(base)
            if m:
                up = tensors["lora_up.weight"]
                down = tensors["lora_down.weight"]
                rank = down.shape[0]
                alpha = float(np.asarray(tensors.get("alpha", np.float32(rank))))
                if not reference_scale_convention:
                    alpha = rank * rank / alpha
                out[target][m.expand(repl)] = {
                    "lora_A": up,
                    "lora_B": down,
                    # NOTE: NOT the kohya file's alpha — this leaf is in the
                    # merge convention of models/lora.py (scale = rank/alpha),
                    # so it holds rank^2/alpha_kohya unless
                    # reference_scale_convention=True (see docstring).
                    "alpha": np.float32(alpha),
                }
                break
        else:
            unmatched.append(base)
    if unmatched:
        raise KeyError(f"{len(unmatched)} unmatched kohya LoRA keys, e.g. {unmatched[:5]}")
    return out
