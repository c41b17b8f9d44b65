"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on CPU with
``--xla_force_host_platform_device_count=8`` per SURVEY.md SS4 test plan.
Must run before jax is imported anywhere.
"""

import os

# Env vars are not reliable in this environment (a TPU plugin overrides
# JAX_PLATFORMS), so use the config API before any backend init.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _isolate_tpu_lease(tmp_path, monkeypatch):
    """Point the chip-handoff busy file at a per-test path so tests that
    drive scale_bench can't clobber (or clear) the advertisement of a
    real build running on this host (utils/tpu_lease.py)."""
    from meme_search_engine_tpu.utils import tpu_lease

    monkeypatch.setattr(
        tpu_lease, "BUSY_PATH", str(tmp_path / "tpu_busy.json")
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def corpus_1k(rng):
    """Synthetic fp16 unit-norm corpus (reference fixture style:
    diskann/src/main.rs loads fp16 real.bin; box_muller randn
    vector.rs:24-33)."""
    x = rng.standard_normal((1000, 128), dtype=np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float16)
