"""Integration-test entry point (reference integration_test.py surface).

The reference's integration test compares a full text -> UNet -> x0 ->
decode pass stage-by-stage against a trusted pipeline
(integration_test.py:32-83; note it no longer runs against the reference's
own main tree — SURVEY 2.12.7).  Ours runs the end-to-end pipeline parity
tests (jitted scan vs the reference torch loop), the CLI drive, and the
golden regression.  Full suite: ``python -m pytest tests/``.
"""

import sys

import pytest

if __name__ == "__main__":
    sys.exit(
        pytest.main(
            [
                "tests/test_pipeline.py",
                "tests/test_cli.py",
                "tests/test_golden.py",
                "-q",
            ]
        )
    )
