"""Mesh construction and sharding rules (the distributed layer the reference
lacks entirely — SURVEY section 2.11).

Design: a 2-D ``jax.sharding.Mesh`` with axes ("data", "model"):
  * data parallelism shards the batch dim (CFG's (uncond, cond) pair and
    n_samples shard cleanly — the reference already batches CFG as
    repeat(2,...) at models/diffusion.py:227-228);
  * tensor parallelism shards the attention-head / FFN-hidden dims of every
    transformer linear (Megatron-style column->row pairing), expressed as
    ``NamedSharding`` placements; XLA GSPMD inserts the all-reduces over ICI.

Convs, norms, and embeddings are replicated on "model" — at SD sizes the
transformer linears dominate TP-shardable FLOPs, and sharding convs would
put collectives around every GroupNorm.

Sequence/context/pipeline/expert parallelism are intentionally out of scope
(77-token text, <=4096-token spatial attention — SURVEY 2.11).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans slices (DCN between hosts, ICI within).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None, model: int = 1, *, devices=None
) -> Mesh:
    """Build a ("data", "model") mesh.  data=None uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), (DATA_AXIS, MODEL_AXIS))


# Column-parallel (shard output dim) then row-parallel (shard input dim):
# activations stay sharded on heads/hidden between q/k/v and out_proj, and
# between fc1/geglu-proj and fc2 — one all-reduce per pair, inserted by GSPMD.
_COL_KERNEL = re.compile(
    r"(q_proj|k_proj|v_proj|query|key|value|fc1|ffn\.0\.proj)\.kernel$"
)
_COL_BIAS = re.compile(r"(q_proj|k_proj|v_proj|query|key|value|fc1|ffn\.0\.proj)\.bias$")
_ROW_KERNEL = re.compile(r"(out_proj|proj_attn|fc2|ffn\.1)\.kernel$")


def param_spec(path: str, leaf) -> P:
    """PartitionSpec for one param leaf, keyed by its dotted path."""
    if getattr(leaf, "ndim", 0) == 2:
        if _COL_KERNEL.search(path):
            return P(None, MODEL_AXIS)
        if _ROW_KERNEL.search(path):
            return P(MODEL_AXIS, None)
    if getattr(leaf, "ndim", 0) == 1 and _COL_BIAS.search(path):
        return P(MODEL_AXIS)
    return P()  # replicated


def _map_with_path(tree, fn, prefix=""):
    if isinstance(tree, dict):
        return {k: _map_with_path(v, fn, f"{prefix}.{k}" if prefix else k) for k, v in tree.items()}
    return fn(prefix, tree)


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh per the TP rules (device_put)."""

    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, param_spec(path, leaf)))

    return _map_with_path(params, place)


def param_shardings(params, mesh: Mesh):
    """The matching pytree of NamedShardings (for jit in_shardings/out)."""
    return _map_with_path(params, lambda p, l: NamedSharding(mesh, param_spec(p, l)))


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim on "data"."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
