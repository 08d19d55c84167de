"""On-hardware conformance tier: runs against the REAL TPU backend.

The main tests/ tree pins jax to CPU (virtual 8-device mesh) so CI never
needs hardware; this tree deliberately does not — it exists to pin the
Mosaic-COMPILED kernel numerics against the gather oracle on the bench
chip (interpret mode exercises the kernel logic, not the lowering).

Run with:  python -m pytest tests_tpu/ -q     (skips everything if no TPU)
"""

import numpy as np
import pytest

import jax


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:
        on_tpu = False
    if on_tpu:
        return
    skip = pytest.mark.skip(reason="no TPU backend: compiled-kernel "
                                   "conformance needs hardware")
    for item in items:
        item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.RandomState(42)
