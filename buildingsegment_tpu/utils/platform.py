"""Device-kernel path selection.

The solvers pick between the Pallas-kernel path and the XLA fallback
by backend platform.  ``BST_FORCE_TPU_PATH=1`` forces the kernel path
on CPU too — every production kernel interprets on CPU (their
``interpret=None`` default resolves by platform), so the forced path
runs the REAL kernel bodies through the Pallas interpreter.  That is
what lets CI pin the full TPU code path (kernel wiring, table packing,
fold-back math) against the XLA fallback without a chip.
"""

from __future__ import annotations

import os

import jax

__all__ = ["use_device_kernels"]


def use_device_kernels() -> bool:
    """True when the Pallas-kernel code path should run."""
    if os.environ.get("BST_FORCE_TPU_PATH") == "1":
        return True
    return jax.devices()[0].platform != "cpu"
