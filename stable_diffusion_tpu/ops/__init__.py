"""Pallas TPU kernels and their XLA reference paths.

Every op here has two implementations:
  * an XLA (jnp) reference path — used on CPU, for parity tests, and as a
    fallback for shapes the kernel does not cover;
  * a Pallas TPU kernel — the production path on TPU hardware.

Selection is via the ``impl`` argument ("auto" | "xla" | "flash"/"pallas"),
replacing the reference's ``use_flash_attention`` runtime toggle
(reference models/unet/attention.py:83-87).
"""

from stable_diffusion_tpu.ops.attention import sdpa  # noqa: F401
