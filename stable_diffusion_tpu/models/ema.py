"""Exponential moving average of parameters.

The reference EMA (models/ema.py:5-27) is broken three ways (SURVEY 2.12.3);
this implements its *intended* spec: copy-through warmup for ``start_ema``
steps, then ema = beta * ema + (1 - beta) * params.  Pure and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    return jax.tree.map(jnp.asarray, params)


def ema_update(ema, params, step, *, beta: float = 0.995, start_ema: int = 2000):
    """step: traced or python int (number of updates applied so far)."""
    step = jnp.asarray(step)
    is_warmup = step < start_ema
    b = jnp.where(is_warmup, 0.0, beta).astype(jnp.float32)

    def upd(e, p):
        return (b * e.astype(jnp.float32) + (1.0 - b) * p.astype(jnp.float32)).astype(e.dtype)

    return jax.tree.map(upd, ema, params)
