"""Generic torch-state-dict -> JAX-pytree ingestion.

Because our param-tree key paths mirror the reference module names, a torch
``state_dict()`` (or a safetensors file with the same naming) converts
mechanically:

  * keys split on "." into nested dicts;
  * ``weight`` renames by tensor rank — rank-4 conv OIHW -> "kernel" HWIO,
    rank-2 linear (out,in) -> "kernel" (in,out) transposed, rank-1 norm ->
    "scale"; rank-2 weights on *embedding* modules stay untransposed as
    "embedding";
  * ``bias`` passes through.

This is the foundation of the parity tests (build any reference torch module,
ingest its state_dict, compare outputs) and of the diffusers converter
(utils/model_converter.py), which first renames diffusers keys to reference
key paths and then ingests through here.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

_EMBEDDING_MARKERS = ("embedding", "embeddings")


def _is_embedding_path(parts) -> bool:
    # the embedding table lives at ...<something>embedding.weight; exclude
    # TimeEmbedding's ffn linears (path contains time_embedding.ffn.N.weight)
    owner = parts[-2] if len(parts) >= 2 else ""
    return any(m in owner for m in _EMBEDDING_MARKERS)


def convert_tensor(parts, value: np.ndarray):
    """(key parts, numpy array) -> (new leaf name, converted array)."""
    name = parts[-1]
    if name == "weight":
        if value.ndim == 4:
            return "kernel", np.transpose(value, (2, 3, 1, 0))  # OIHW -> HWIO
        if value.ndim == 2:
            if _is_embedding_path(parts):
                return "embedding", value
            return "kernel", np.transpose(value, (1, 0))  # (out,in) -> (in,out)
        if value.ndim == 1:
            return "scale", value
    return name, value


def from_torch_state_dict(state_dict: Mapping[str, "np.ndarray"], *, dtype=None) -> Dict:
    """Nested pytree from a flat {dotted.name: tensor} mapping.

    Accepts torch tensors or numpy arrays.  Non-parameter buffers named
    ``position_ids`` are dropped (reference openclip.py:150-152 pops them
    too).
    """
    tree: Dict = {}
    for key, val in state_dict.items():
        parts = key.split(".")
        if parts[-1] == "position_ids":
            continue
        if hasattr(val, "detach"):
            val = val.detach().cpu().numpy()
        val = np.asarray(val)
        if dtype is not None:
            val = val.astype(dtype)
        leaf, val = convert_tensor(parts, val)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[leaf] = val
    return tree


def flatten_tree(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_tree(v, path))
        else:
            out[path] = v
    return out


def tree_checksums(tree) -> Dict[str, tuple]:
    """(shape, float64 sum) per leaf — the param-tree checksum tool of
    SURVEY build-plan step 1, for converter verification."""
    flat = flatten_tree(tree)
    return {
        k: (tuple(np.shape(v)), float(np.sum(np.asarray(v, dtype=np.float64))))
        for k, v in sorted(flat.items())
    }
