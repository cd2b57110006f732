"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharded code paths are
exercised on fake devices (SURVEY.md §4 "Multi-chip without a cluster").

Note: this environment's sitecustomize imports jax at interpreter
startup (the axon TPU-tunnel plugin), so plain env vars here are too
late — the platform override must go through jax.config, and XLA_FLAGS
must be set before the first CPU client is created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
