"""Tracing / profiling hooks (SURVEY §5 tracing row).

The reference's observability is tqdm progress + wall-clock load timing; on
TPU the useful primitive is an XLA trace.  This module wraps jax.profiler
for one-line use from the CLIs (``--profile_dir``) and adds a wall-clock
section timer that forces a device fetch (plain ``block_until_ready`` does
not actually block on remote transports — measured on the axon backend)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA/TPU trace viewable in TensorBoard's profile plugin.
    No-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Wall-clock section timing with forced device sync."""

    def __init__(self):
        self.sections = {}

    @contextlib.contextmanager
    def section(self, name: str, result=None):
        t0 = time.perf_counter()
        out = {}
        yield out
        sync = out.get("sync", result)
        if sync is not None:
            np.asarray(jax.tree_util.tree_leaves(sync)[0])  # force fetch
        self.sections[name] = self.sections.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.sections.values())
        lines = [f"{k}: {v*1000:.1f} ms ({v/total*100:.0f}%)" for k, v in self.sections.items()]
        return "\n".join(lines)
