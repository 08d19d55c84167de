"""Crawler + dataset pipeline tests on synthetic scenes."""

import os

import numpy as np
import pytest

from dvmvs_tpu.config import DepthConfig, TrainConfig
from dvmvs_tpu.data.crawler import crawl, gather_pairs_train, is_valid_pair
from dvmvs_tpu.data.dataset import (
    MVSSequenceDataset,
    adjust_brightness,
    adjust_contrast,
    adjust_gamma,
    batch_iterator,
)


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    """Two scenes of 40 frames translating along +x at 0.08 m/frame."""
    root = tmp_path_factory.mktemp("trainset")
    rs = np.random.RandomState(0)
    H, W = 48, 64
    for scene in ("scene0", "scene1"):
        sdir = root / scene
        sdir.mkdir()
        poses = []
        for i in range(40):
            pose = np.eye(4)
            pose[0, 3] = 0.08 * i
            pose[1, 3] = 0.01 * rs.randn()
            poses.append(pose.reshape(-1))
            image = rs.randint(0, 255, (H, W, 3)).astype(np.uint8)
            depth = (rs.uniform(500, 6000, (H, W))).astype(np.uint16)
            np.savez(sdir / f"{i:05d}.npz", image=image, depth=depth)
        np.savetxt(sdir / "poses.txt", np.array(poses))
        K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]])
        np.savetxt(sdir / "K.txt", K)
    (root / "train.txt").write_text("scene0\nscene1\n")
    (root / "validation.txt").write_text("scene1\n")
    return str(root)


def test_gather_pairs_window(synthetic_root):
    poses = np.reshape(
        np.loadtxt(os.path.join(synthetic_root, "scene0", "poses.txt")), (-1, 4, 4))
    pairs = gather_pairs_train(poses, set(), False, 0.125, 0.325)
    assert len(pairs) > 5
    for i, j in pairs:
        assert is_valid_pair(poses[i], poses[j], 0.125 / 1.1 ** 5, 0.325 * 1.1 ** 5)


def test_crawl_pairs_and_subsequences(synthetic_root):
    pairs = crawl(synthetic_root, ["scene0", "scene1"], 2, num_workers=1)
    assert len(pairs) > 10
    assert all(len(s["indices"]) == 2 for s in pairs)

    subs = crawl(synthetic_root, ["scene0", "scene1"], 4, num_workers=1)
    assert len(subs) > 2
    assert all(len(s["indices"]) == 4 for s in subs)
    # consecutive pose distances in (loosened) window
    for s in subs[:5]:
        poses = np.reshape(
            np.loadtxt(os.path.join(synthetic_root, s["scene"], "poses.txt")), (-1, 4, 4))
        idx = s["indices"]
        for a, b in zip(idx[:-1], idx[1:]):
            assert is_valid_pair(poses[a], poses[b], 0.125 * 0.666, 0.325 * 1.5)


def test_dataset_getitem(synthetic_root):
    cfg = TrainConfig(image_width=64, image_height=48, data_pipeline_workers=1)
    ds = MVSSequenceDataset(
        synthetic_root, "TRAINING", 4, cfg,
        geometric_scale_augmentation=True, seed=3)
    item = ds[0]
    assert item["images"].shape == (4, 48, 64, 3)
    assert item["depths"].shape == (4, 48, 64)
    assert item["poses"].shape == (4, 4, 4)
    assert item["K"].shape == (3, 3)
    # depths within global range after geometric scaling
    d = item["depths"]
    assert d[d > 0].min() >= cfg.depth.min_depth - 1e-5
    assert d.max() <= cfg.depth.max_depth + 1e-5


def test_batch_iterator(synthetic_root):
    cfg = TrainConfig(image_width=64, image_height=48, data_pipeline_workers=1)
    ds = MVSSequenceDataset(synthetic_root, "VALIDATION", 2, cfg, seed=0)
    batches = list(batch_iterator(ds, batch_size=2, shuffle=True, seed=0))
    assert len(batches) >= 1
    assert batches[0]["images"].shape == (2, 2, 48, 64, 3)


def test_color_augmenters_match_kornia_semantics():
    x = np.linspace(0, 1, 11, dtype=np.float32).reshape(1, 11)
    np.testing.assert_allclose(adjust_brightness(x, 0.5).max(), 1.0)
    np.testing.assert_allclose(adjust_brightness(x, -0.5).min(), 0.0)
    np.testing.assert_allclose(adjust_contrast(x, 2.0), np.clip(x * 2, 0, 1))
    np.testing.assert_allclose(adjust_gamma(x, 2.0), x ** 2)


def test_wire_compact_roundtrip(synthetic_root):
    """Compact wire format: uint8 images + f16 depths, decoded on device by
    decode_wire_batch. Validation (no color aug) must be BIT-IDENTICAL to
    the float32 pipeline; training differs only by the <=0.5/255
    quantization dither after augmentation."""
    import jax.numpy as jnp

    from dvmvs_tpu.parallel.train import decode_wire_batch

    cfg = TrainConfig(image_width=64, image_height=48, data_pipeline_workers=1)

    # validation: exact
    f32 = MVSSequenceDataset(synthetic_root, "VALIDATION", 2, cfg, seed=0)
    u8 = MVSSequenceDataset(synthetic_root, "VALIDATION", 2, cfg, seed=0,
                            wire_compact=True)
    a, b = f32[0], u8[0]
    assert b["images"].dtype == np.uint8 and b["depths"].dtype == np.float16
    dec = decode_wire_batch({k: jnp.asarray(v) for k, v in b.items()})
    np.testing.assert_array_equal(np.asarray(dec["images"]), a["images"])
    np.testing.assert_allclose(np.asarray(dec["depths"]), a["depths"],
                               atol=1e-2)
    assert dec["depths"].dtype == jnp.float32

    # training (color aug fires): dither bounded by the uint8 quantum
    f32 = MVSSequenceDataset(synthetic_root, "TRAINING", 2, cfg, seed=5,
                             geometric_scale_augmentation=True)
    u8 = MVSSequenceDataset(synthetic_root, "TRAINING", 2, cfg, seed=5,
                            geometric_scale_augmentation=True,
                            wire_compact=True)
    a, b = f32[0], u8[0]
    dec = decode_wire_batch({k: jnp.asarray(v) for k, v in b.items()})
    quantum = (0.5 / 255.0) / min(0.229, 0.224, 0.225)
    np.testing.assert_allclose(
        np.asarray(dec["images"]), a["images"], atol=quantum + 1e-6)
    # a float32 batch passes through decode_wire_batch untouched
    same = decode_wire_batch({k: jnp.asarray(v) for k, v in a.items()})
    np.testing.assert_array_equal(np.asarray(same["images"]), a["images"])
