"""Test configuration: force a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding tests run against
XLA's host-platform device virtualization (the TPU-world equivalent of a
fake backend). The sandbox's sitecustomize registers the remote-TPU (axon)
backend at interpreter start and pins ``jax_platforms``, so we must override
via jax.config here, not just env vars.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # On few-core hosts (this sandbox: nproc=1) the 8 virtual devices'
    # in-process collective rendezvous routinely exceeds its default 40 s
    # SIGABRT timeout — replicas serialize and blocked waits starve the
    # rest. Waiting longer is always correct here.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=600")
if "xla_backend_optimization_level" not in flags:
    # Tests assert numerics, not speed: XLA:CPU's full optimization
    # pipeline costs minutes per large program on a single core, and
    # backend level 1 produces identical results (the TPU compile path is
    # exercised separately by bench.py and the drivers).
    flags += " --xla_backend_optimization_level=1"
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run EVERYTHING incl. tests marked slow (multi-minute "
             "compiles/training loops); implies --runheavy",
    )
    parser.addoption(
        "--runheavy", action="store_true", default=False,
        help="also run tests marked heavy (torch-oracle parity, train-step "
             "and e2e-driver tests — the full-coverage tier, ~30 min on a "
             "1-core host)",
    )


def pytest_collection_modifyitems(config, items):
    run_slow = config.getoption("--runslow")
    run_heavy = run_slow or config.getoption("--runheavy")
    skip_slow = pytest.mark.skip(reason="slow test: pass --runslow to run")
    skip_heavy = pytest.mark.skip(
        reason="heavy test: pass --runheavy (or --runslow) to run")
    for item in items:
        if not run_slow and "slow" in item.keywords:
            item.add_marker(skip_slow)
        elif not run_heavy and "heavy" in item.keywords:
            item.add_marker(skip_heavy)


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def random_pose(rs: np.random.RandomState, t_scale: float = 0.5) -> np.ndarray:
    """Random valid camera-to-world pose (rotation via QR, det +1)."""
    A = rs.randn(3, 3)
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    pose = np.eye(4)
    pose[:3, :3] = Q
    pose[:3, 3] = rs.randn(3) * t_scale
    return pose
