"""Model shape/semantics tests (CPU, small inputs)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dvmvs_tpu.models import FusionNet, PairNet, init_lstm_carry
from dvmvs_tpu.models.convlstm import spatial_layer_norm
from dvmvs_tpu.models.mnasnet import MnasFeatureExtractor
from tests.conftest import random_pose

H, W, V = 64, 96, 2


def _inputs(rng, B=1):
    ref = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    meas = jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32))
    rp = jnp.asarray(np.stack([random_pose(rng, 0.1) for _ in range(B)]).astype(np.float32))
    mp = jnp.asarray(
        np.stack([[random_pose(rng, 0.1) for _ in range(V)] for _ in range(B)]).astype(np.float32))
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], dtype=np.float32)
    K = jnp.asarray(np.stack([K] * B))
    return ref, meas, rp, mp, K


def test_mnasnet_stage_shapes(rng):
    model = MnasFeatureExtractor()
    x = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    l1, l2, l3, l4, l5 = model.apply(variables, x)
    assert l1.shape == (1, H // 2, W // 2, 16)
    assert l2.shape == (1, H // 4, W // 4, 24)
    assert l3.shape == (1, H // 8, W // 8, 40)
    assert l4.shape == (1, H // 16, W // 16, 96)
    assert l5.shape == (1, H // 32, W // 32, 320)


def test_pairnet_forward_shapes(rng):
    model = PairNet()
    inputs = _inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), *inputs)
    depths = model.apply(variables, *inputs)
    assert len(depths) == 5
    scales = [1, 2, 4, 8, 16]
    for d, s in zip(depths, scales):
        assert d.shape == (1, H // s, W // s)
        d = np.asarray(d)
        assert np.all(d >= 0.25 - 1e-5) and np.all(d <= 20.0 + 1e-5)


def test_fusionnet_forward_and_carry(rng):
    model = FusionNet()
    ref, meas, rp, mp, K = _inputs(rng)
    carry = init_lstm_carry(1, H, W)
    prev_pose = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    hyp = jnp.zeros((1, H // 32, W // 32), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ref, meas, rp, mp, K, carry, prev_pose, hyp)
    depths, carry2 = model.apply(variables, ref, meas, rp, mp, K, carry, prev_pose, hyp)
    assert depths[0].shape == (1, H, W)
    assert carry2.h.shape == (1, H // 32, W // 32, 512)
    assert float(jnp.abs(carry2.h).max()) > 0  # state updated

    # second step with a real hypothesis: recurrence changes the output
    depths_b, carry3 = model.apply(
        variables, ref, meas, rp, mp, K, carry2, rp,
        jnp.full((1, H // 32, W // 32), 2.0, jnp.float32))
    assert float(jnp.abs(depths_b[0] - depths[0]).max()) > 0


def test_fusionnet_zero_carry_equals_reset_semantics(rng):
    """With h=c=0, identity prev_pose and zero hypothesis, the warped hidden
    state is zero — two different prev_poses must give identical output
    (the reference's lstm_state=None branch)."""
    model = FusionNet()
    ref, meas, rp, mp, K = _inputs(rng)
    carry = init_lstm_carry(1, H, W)
    hyp = jnp.zeros((1, H // 32, W // 32), jnp.float32)
    eye = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    variables = model.init(jax.random.PRNGKey(0), ref, meas, rp, mp, K, carry, eye, hyp)
    d1, _ = model.apply(variables, ref, meas, rp, mp, K, carry, eye, hyp)
    other = jnp.asarray(random_pose(rng, 0.5).astype(np.float32)[None])
    d2, _ = model.apply(variables, ref, meas, rp, mp, K, carry, other, hyp)
    np.testing.assert_allclose(np.asarray(d1[0]), np.asarray(d2[0]), atol=1e-6)


def test_spatial_layer_norm_matches_torch(rng):
    x = rng.randn(2, 7, 9, 5).astype(np.float32)
    got = spatial_layer_norm(jnp.asarray(x))
    want = torch.layer_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), [7, 9]
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_celu_matches_torch(rng):
    x = rng.randn(64).astype(np.float32)
    got = jax.nn.celu(jnp.asarray(x))
    want = torch.celu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_flax_conv_matches_torch_conv(rng):
    """Pin the OIHW->HWIO weight transpose convention used by the
    torch->jax checkpoint converter."""
    import flax.linen as nn

    tconv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1, bias=True)
    x = rng.randn(1, 4, 10, 12).astype(np.float32)
    want = tconv(torch.from_numpy(x)).detach().numpy()

    fconv = nn.Conv(6, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    kernel = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
    bias = tconv.bias.detach().numpy()
    variables = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}}
    got = fconv.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5)
