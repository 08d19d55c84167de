"""Baseline plugin tests (small shapes, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvmvs_tpu.baselines.gpmvs import (
    KalmanLatentState,
    gp_batch_smooth,
    matern32_kernel,
)
from dvmvs_tpu.baselines.mvdepth_backbone import MVDepthDecoder, MVDepthEncoder
from tests.conftest import random_pose


def test_mvdepth_backbone_shapes(rng):
    H, W = 64, 96
    enc = MVDepthEncoder()
    dec = MVDepthDecoder()
    img = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    cv = jnp.asarray(rng.randn(1, H, W, 64).astype(np.float32))
    ev = enc.init(jax.random.PRNGKey(0), img, cv)
    feats = enc.apply(ev, img, cv)
    assert [f.shape[-1] for f in feats] == [512, 512, 512, 256, 128]
    assert feats[0].shape[1:3] == (H // 32, W // 32)
    dv = dec.init(jax.random.PRNGKey(1), *feats)
    disps = dec.apply(dv, *feats)
    assert disps[0].shape == (1, H, W, 1)
    d = np.asarray(disps[0])
    assert (d >= 0).all() and (d <= 2.0 + 1e-5).all()  # 2 * sigmoid


def test_matern_kernel_properties():
    D = np.array([[0.0, 1.0], [1.0, 0.0]])
    K = matern32_kernel(D, gamma2=2.0, ell=0.5)
    np.testing.assert_allclose(np.diag(K), 2.0)
    assert K[0, 1] == K[1, 0] and 0 < K[0, 1] < 2.0


def test_gp_batch_smooth_identity_limit(rng):
    """sigma2 -> 0 makes the posterior mean interpolate the observations."""
    D = np.abs(np.subtract.outer(np.arange(4.0), np.arange(4.0)))
    Y = rng.rand(4, 7)
    Z = gp_batch_smooth(D, Y, gamma2=1.0, ell=1.0, sigma2=1e-10)
    np.testing.assert_allclose(Z, np.maximum(Y, 0), atol=1e-5)


def test_kalman_matches_batch_gp(rng):
    """The state-space (Kalman) form must match the batch GP posterior at
    the last point for 1-D cumulative distances (Matern-3/2 SDE duality)."""
    gamma2, ell, sigma2 = 1.3, 0.7, 0.05
    dts = [0.4, 0.3, 0.6, 0.2]
    y = rng.randn(len(dts), 3)

    kal = KalmanLatentState(3, gamma2, ell, sigma2)
    for i, dt in enumerate(dts):
        z_last = kal.step(y[i], dt if i > 0 else 0.0)

    t = np.concatenate([[0.0], np.cumsum(dts[1:])])
    D = np.abs(np.subtract.outer(t, t))
    K = matern32_kernel(D, gamma2, ell)
    C = K + sigma2 * np.eye(len(t))
    Z_batch = K @ np.linalg.solve(C, y)
    np.testing.assert_allclose(z_last, Z_batch[-1], atol=1e-6)


@pytest.mark.heavy
@pytest.mark.parametrize("name", ["mvdepthnet", "gpmvs", "dpsnet"])
def test_baseline_predict_smoke(rng, name, monkeypatch):
    """Each plugin runs end-to-end on tiny shapes with padded views."""
    from dvmvs_tpu.baselines.registry import BASELINE_REGISTRY
    import dvmvs_tpu.baselines.mvdepthnet  # noqa: F401
    import dvmvs_tpu.baselines.gpmvs  # noqa: F401
    import dvmvs_tpu.baselines.dpsnet  # noqa: F401

    cls = BASELINE_REGISTRY[name]
    # dpsnet's SPP pools need >= 128 px; the U-Nets need multiples of 32
    w, h = (128, 128) if name == "dpsnet" else (64, 32)
    monkeypatch.setattr(cls, "image_width", w)
    monkeypatch.setattr(cls, "image_height", h)
    est = cls(n_measurement_frames=2)

    H, W = est.image_height, est.image_width
    ref = rng.randn(H, W, 3).astype(np.float32)
    meas = [rng.randn(H, W, 3).astype(np.float32)]
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    pose1 = np.eye(4, dtype=np.float32)
    pose2 = random_pose(rng, 0.1).astype(np.float32)

    est.reset()
    depth = est.predict(ref, meas, pose1, [pose2], K)
    assert depth.shape == (H, W)
    assert np.isfinite(depth).all()
    assert (depth > 0).all()


def test_deltas_components(rng):
    """DELTAS sub-components: NMS keeps only local maxima; DLT recovers a
    known 3D point from exact projections."""
    import jax.numpy as jnp
    from dvmvs_tpu.baselines.deltas import simple_nms, triangulate_dlt

    s = np.zeros((1, 16, 16), np.float32)
    s[0, 5, 5] = 1.0
    s[0, 5, 7] = 0.8  # within radius of the stronger peak
    s[0, 12, 12] = 0.9
    out = np.asarray(simple_nms(jnp.asarray(s), radius=2))
    assert out[0, 5, 5] == 1.0 and out[0, 12, 12] == 0.9
    assert out[0, 5, 7] == 0.0

    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    X = np.array([0.3, -0.2, 2.5])
    projs, pts = [], []
    for tx in (0.0, 0.2, -0.15):
        T = np.eye(4)
        T[0, 3] = tx
        P = K @ T[:3]
        p = P @ np.append(X, 1.0)
        pts.append(p[:2] / p[2])
        projs.append(P)
    got = np.asarray(triangulate_dlt(
        jnp.asarray(np.stack(projs), dtype=jnp.float32),
        jnp.asarray(np.stack(pts)[None], dtype=jnp.float32),  # (Kn=1, V, 2)
        jnp.ones((1, 3), jnp.float32)))
    np.testing.assert_allclose(got[0], X, atol=1e-3)


@pytest.mark.heavy
def test_deltas_predict_smoke(rng):
    from dvmvs_tpu.baselines.deltas import Deltas

    class SmallDeltas(Deltas):
        image_width = 64
        image_height = 48

    est = SmallDeltas(n_measurement_frames=1)
    H, W = 48, 64
    ref = rng.randn(H, W, 3).astype(np.float32)
    meas = [rng.randn(H, W, 3).astype(np.float32)]
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    pose2 = np.eye(4, dtype=np.float32)
    pose2[0, 3] = 0.1
    depth = est.predict(ref, meas, np.eye(4, dtype=np.float32), [pose2], K)
    assert depth.shape == (H, W)
    assert np.isfinite(depth).all() and (depth > 0).all()
