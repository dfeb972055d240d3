"""Training checkpoint save/resume.

TPU-native replacement for the reference's torch.save({epoch, model_state_
dict, optimizer_state_dict, train_loss}) per-epoch checkpoints
(train_lora_dreambooth.py:259-287) and --pretrained_path resume (:354-360).

Primary path is Orbax (async-capable, sharding-aware); a msgpack fallback
(flax.serialization) covers environments without Orbax.  LoRA-only saves
mirror the reference's requires_grad-subset checkpoints: the train state's
"lora" tree IS the trainable subset, so saving the state is already
LoRA-only unless full params are passed explicitly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_train_checkpoint(path: str, state: Dict[str, Any], *, use_orbax: bool = True) -> str:
    """state: the training.init_train_state pytree (+ anything else).
    Returns the path written."""
    state = _to_numpy(state)
    if use_orbax:
        try:
            import orbax.checkpoint as ocp

            path = os.path.abspath(path)
            ckptr = ocp.PyTreeCheckpointer()
            ckptr.save(path, state, force=True)
            return path
        except Exception:
            pass  # fall through to msgpack
    from flax import serialization

    path = path if path.endswith(".msgpack") else path + ".msgpack"
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    return path


def load_train_checkpoint(path: str, *, target: Optional[Dict[str, Any]] = None):
    """Load a checkpoint saved by save_train_checkpoint.  ``target`` (a
    matching pytree, e.g. a fresh init_train_state) restores exact types for
    the msgpack path; Orbax restores standalone."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)
