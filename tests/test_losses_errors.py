import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dvmvs_tpu.utils.errors import compute_errors
from dvmvs_tpu.utils.losses import calculate_loss, multi_scale_loss


def torch_loss_oracle(gt, pred):
    """Torch implementation of the masked per-scale loss sums."""
    gt = torch.from_numpy(gt)[:, None]
    pred_t = torch.from_numpy(pred)[:, None]
    gt_s = F.interpolate(gt, size=pred.shape[1:], mode="nearest")
    mask = gt_s != 0
    count = int(mask.sum())
    g, p = gt_s[mask], pred_t[mask]
    l1 = (g - p).abs().sum().item()
    huber = F.smooth_l1_loss(p, g, reduction="sum").item()
    l1_inv = (1.0 / g - 1.0 / p).abs().sum().item()
    l1_rel = ((g - p).abs() / g).sum().item()
    return l1, huber, l1_inv, l1_rel, count


def test_calculate_loss_matches_torch(rng):
    B, H, W = 2, 16, 16
    gt = rng.uniform(0.5, 10.0, size=(B, H, W)).astype(np.float32)
    gt[rng.rand(B, H, W) < 0.3] = 0.0  # invalid pixels
    pred = rng.uniform(0.5, 10.0, size=(B, 8, 8)).astype(np.float32)

    l1, huber, l1_inv, l1_rel, count = torch_loss_oracle(gt, pred)
    got = calculate_loss(jnp.asarray(gt), jnp.asarray(pred))
    assert int(got["valid_count"]) == count
    np.testing.assert_allclose(float(got["l1"]), l1, rtol=1e-4)
    np.testing.assert_allclose(float(got["huber"]), huber, rtol=1e-4)
    np.testing.assert_allclose(float(got["l1_inv"]), l1_inv, rtol=1e-4)
    np.testing.assert_allclose(float(got["l1_rel"]), l1_rel, rtol=1e-4)


def test_multi_scale_loss_weighting(rng):
    gt = rng.uniform(0.5, 10.0, size=(1, 8, 8)).astype(np.float32)
    preds = [
        jnp.asarray(rng.uniform(0.5, 10.0, size=(1, s, s)).astype(np.float32))
        for s in (2, 4, 8)
    ]
    total, _ = multi_scale_loss(preds, [1, 1, 1], jnp.asarray(gt), "L1-inv")
    manual = 0.0
    for p in preds:
        terms = calculate_loss(jnp.asarray(gt), p)
        manual += float(terms["l1_inv"]) / float(terms["valid_count"])
    np.testing.assert_allclose(float(total), manual, rtol=1e-5)


def test_compute_errors_perfect():
    gt = np.full((32, 32), 2.0)
    out = compute_errors(gt, gt.copy())
    np.testing.assert_allclose(out[:5], 0.0, atol=1e-7)
    np.testing.assert_allclose(out[5:], 1.0)


def test_compute_errors_validity_threshold():
    gt = np.full((4, 4), 0.4)  # below the 0.5 m validity floor
    out = compute_errors(gt, gt)
    assert all(np.isnan(v) for v in out)


def test_compute_errors_known_values():
    gt = np.full((10,), 2.0)
    pred = np.full((10,), 2.5)
    out = compute_errors(gt, pred)
    np.testing.assert_allclose(out[0], 0.5)          # abs
    np.testing.assert_allclose(out[1], 0.25)         # abs-rel
    np.testing.assert_allclose(out[2], 0.1)          # abs-inv
    np.testing.assert_allclose(out[3], 0.125)        # sq-rel
    np.testing.assert_allclose(out[4], 0.5)          # rmse
    np.testing.assert_allclose(out[5], 0.0)          # 1.25 ratio: 1.25 !< 1.25
    np.testing.assert_allclose(out[6], 1.0)
