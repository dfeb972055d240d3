"""Unit-test entry point (reference unit_test.py surface).

The reference's unit tests are golden-parity checks of the text encoder,
VAE, and UNet against a trusted oracle (unit_test.py:10-112, oracle = HF
pretrained weights, MSE == 0).  Ours run the same strategy against the
PyTorch reference implementation itself with tiny configs — no 5 GB
checkpoint downloads needed.  This shim runs that subset; the full suite is
``python -m pytest tests/``.
"""

import sys

import pytest

if __name__ == "__main__":
    sys.exit(
        pytest.main(
            [
                "tests/test_clip.py",
                "tests/test_vae.py",
                "tests/test_unet.py",
                "tests/test_layers.py",
                "-q",
            ]
        )
    )
