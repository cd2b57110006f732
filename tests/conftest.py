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
# The persistent compile cache must stay OFF under pytest: CLI tests
# call cli.main in-process, which sets jax_compilation_cache_dir for
# the rest of the suite, and a later cache READ of a Pallas
# interpret-mode program segfaulted the whole run (2026-08-20, twice,
# both at test_stats_sweep.py::test_radius_only_mode_matches_window_
# normals inside compilation_cache.get_executable_and_time).  CPU test
# compiles are fast; only the TPU remote compiles need the disk cache.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
