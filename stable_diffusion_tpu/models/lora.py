"""LoRA adaptation as pure pytree transforms.

Re-design of the reference's weight-parametrization LoRA (models/lora.py:6-70)
for a functional framework: instead of mutating modules, LoRA lives in a
separate pytree mirroring the target params' key paths, and is *merged* into
the base weights — at load time for inference (zero runtime overhead) or
inside the loss function for training (gradients flow to A/B only).

Semantics match the reference:
  * Linear:  W = W0 + (A @ B) * scale, A: (out, r) ~ N(0,1), B: (r, in) = 0
    (reference lora.py:6-20 — A normal, B zeros).
  * Conv:    delta[o,i,kh,kw] = sum_r A[o,r,kh,kw] * B[r,i,kh,kw]
    (the reference's einsum "abcd,becd->aecd", lora.py:22-36).
  * scale = rank / alpha — the reference's (inverted) convention
    (lora.py:10; kohya checkpoints carry alpha/rank, handled by the
    converter which stores the reference-convention alpha).
  * Target selection by key-path suffix match, like the reference's
    ``name.endswith(lora_module)`` (lora.py:47-70).

We store LoRA tensors in torch orientation (A: (out, r), B: (r, in)) so kohya
checkpoints round-trip without transposes; the merge transposes once.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Default target suffixes, matching the reference CLIs
# (inference.py:111-114, train_lora_dreambooth.py:325-330).
DEFAULT_UNET_TARGETS = (
    "q_proj", "k_proj", "v_proj", "out_proj", "conv_input", "conv_output",
    "ffn.0.proj", "ffn.1",
)


def _iter_leaf_modules(params, prefix=""):
    """Yield (path, subtree) for every subtree that owns a 'kernel'."""
    if isinstance(params, dict):
        if "kernel" in params:
            yield prefix, params
        else:
            for k, v in params.items():
                yield from _iter_leaf_modules(v, f"{prefix}.{k}" if prefix else k)


def match_targets(params, targets: Sequence[str]) -> List[str]:
    """Key paths of kernel-owning modules whose path ends with a target suffix."""
    out = []
    for path, _ in _iter_leaf_modules(params):
        if any(path.endswith(t) for t in targets):
            out.append(path)
    return sorted(out)


def _get(tree, path: str):
    for k in path.split("."):
        tree = tree[k]
    return tree


def init_lora(
    key,
    params,
    *,
    rank: int,
    alpha: float,
    targets: Sequence[str] = DEFAULT_UNET_TARGETS,
    dtype=jnp.float32,
) -> Dict[str, dict]:
    """Create a LoRA pytree {path: {lora_A, lora_B, alpha}} for matching modules."""
    lora = {}
    paths = match_targets(params, targets)
    keys = jax.random.split(key, max(len(paths), 1))
    for k, path in zip(keys, paths):
        kernel = _get(params, path)["kernel"]
        if kernel.ndim == 2:  # (in, out) -> torch (out, in)
            in_dim, out_dim = kernel.shape
            a = jax.random.normal(k, (out_dim, rank), dtype)
            b = jnp.zeros((rank, in_dim), dtype)
        elif kernel.ndim == 4:  # (kh, kw, in, out)
            kh, kw, in_dim, out_dim = kernel.shape
            a = jax.random.normal(k, (out_dim, rank, kh, kw), dtype)
            b = jnp.zeros((rank, in_dim, kh, kw), dtype)
        else:
            continue
        lora[path] = {"lora_A": a, "lora_B": b, "alpha": jnp.asarray(alpha, dtype)}
    return lora


def lora_delta(entry, kernel_shape) -> jax.Array:
    """Merged-kernel delta in OUR orientation for one LoRA entry."""
    a, b = entry["lora_A"], entry["lora_B"]
    rank = a.shape[1]
    scale = rank / entry["alpha"]  # reference convention (lora.py:10)
    if a.ndim == 2:
        delta = (a @ b) * scale  # (out, in)
        return delta.T  # -> (in, out)
    # conv: A (O, r, kh, kw), B (r, I, kh, kw) -> (kh, kw, I, O)
    delta = jnp.einsum("orhw,rihw->oihw", a, b) * scale
    return delta.transpose(2, 3, 1, 0)


def merge_lora(params, lora: Dict[str, dict], *, enabled: bool = True):
    """Return params with LoRA deltas folded into the target kernels.

    Pure and jit-safe; called inside the training loss so grads reach A/B.
    ``enabled=False`` mirrors the reference's enable_lora toggle
    (lora.py:47-52) and returns params unchanged.
    """
    if not enabled or not lora:
        return params

    def merge_at(tree, parts, entry):
        head = parts[0]
        sub = dict(tree)
        if len(parts) == 1:
            leaf = dict(sub[head])
            leaf["kernel"] = leaf["kernel"] + lora_delta(entry, leaf["kernel"].shape).astype(
                leaf["kernel"].dtype
            )
            sub[head] = leaf
        else:
            sub[head] = merge_at(sub[head], parts[1:], entry)
        return sub

    for path, entry in lora.items():
        params = merge_at(params, path.split("."), entry)
    return params

