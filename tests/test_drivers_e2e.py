"""End-to-end driver tests: the full L4->L6 path on a tiny synthetic scene.

Covers what module tests can't: preprocess -> keyframe buffer -> fused
encode+predict (engine state handling incl. tracking-lost reset) -> metrics
-> npz save format -> TSDF reconstruction consuming the saved npz.
(Reference behavior: fusionnet/run-testing-online.py:102-231,
run-testing.py:95-108, sample-data/run-tsdf-reconstruction.py:477-662.)
"""

import os

import cv2
import numpy as np
import pytest

from dvmvs_tpu.config import DepthConfig, TestConfig

H_SRC, W_SRC = 64, 96  # source frame size == test size (no crop/resize work)
N_FRAMES = 26
LOST_START, LOST_END = 10, 16  # NaN-pose segment (tracking lost mid-scene)


@pytest.fixture(scope="module")
def png_scene(tmp_path_factory):
    """Canonical scene layout (images/ depth/ poses.txt K.txt) translating
    along +x with a NaN-pose segment in the middle."""
    root = tmp_path_factory.mktemp("testset")
    scene = root / "tinyset" / "000"
    (scene / "images").mkdir(parents=True)
    (scene / "depth").mkdir()
    rs = np.random.RandomState(7)
    poses = []
    for i in range(N_FRAMES):
        pose = np.eye(4)
        pose[0, 3] = 0.12 * i
        pose[1, 3] = 0.01 * rs.randn()
        if LOST_START <= i < LOST_END:
            pose[:] = np.nan
        poses.append(pose.reshape(-1))
        image = rs.randint(0, 255, (H_SRC, W_SRC, 3)).astype(np.uint8)
        cv2.imwrite(str(scene / "images" / f"{i:05d}.png"),
                    cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
        depth_mm = rs.uniform(1500, 3500, (H_SRC, W_SRC)).astype(np.uint16)
        cv2.imwrite(str(scene / "depth" / f"{i:05d}.png"), depth_mm)
    np.savetxt(scene / "poses.txt", np.array(poses))
    K = np.array([[70.0, 0, W_SRC / 2], [0, 70.0, H_SRC / 2], [0, 0, 1]])
    np.savetxt(scene / "K.txt", K)
    return str(root)


@pytest.fixture(scope="module")
def tiny_cfg():
    return TestConfig(
        image_width=W_SRC,
        image_height=H_SRC,
        depth=DepthConfig(min_depth=0.25, max_depth=20.0, n_depth_levels=64),
        n_measurement_frames=2,
    )


@pytest.mark.heavy
def test_predict_scene_online_fusionnet_with_tracking_lost(
        png_scene, tiny_cfg, monkeypatch):
    """Online driver on the NaN-segment scene: keyframe buffer declares
    tracking lost (shortened limit), the engine state resets, and prediction
    resumes after recovery — the reference's run-testing-online.py:110-114
    behavior."""
    import dvmvs_tpu.utils.keyframe_buffer as kb
    from dvmvs_tpu.apps.engine import InferenceEngine
    from dvmvs_tpu.apps.run_testing_online import predict_scene

    monkeypatch.setattr(kb, "TRACKING_LOST_LIMIT", 3)

    engine = InferenceEngine("fusionnet", tiny_cfg)
    scene = os.path.join(png_scene, "tinyset", "000")
    predictions, gts = predict_scene(engine, scene, tiny_cfg, evaluate=True)

    # frames 0..9 walk at 0.12 m/step (> keyframe distance 0.1): first frame
    # seeds the buffer, then every frame is a keyframe with measurements.
    # After the NaN segment the buffer was cleared and state reset; the walk
    # resumes, so predictions must also come from the post-lost segment.
    assert len(predictions) >= (LOST_START - 1) + (N_FRAMES - LOST_END - 1)
    for p in predictions:
        assert p.shape == (H_SRC, W_SRC)
        assert np.isfinite(p).all()
        assert (p >= tiny_cfg.depth.min_depth - 1e-5).all()
        assert (p <= tiny_cfg.depth.max_depth + 1e-5).all()
    assert gts is not None and len(gts) == len(predictions)
    # the engine's recurrent state was re-seeded after the reset
    assert float(engine.has_prev) == 1.0


HOLOLENS = "/root/reference/sample-data/hololens-dataset/000"
HOLOLENS_IDX = ("/root/reference/sample-data/indices/"
                "keyframe+hololens-dataset+000+nmeas+2")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(HOLOLENS),
                    reason="hololens sample scene not mounted")
def test_evaluate_scene_hololens_real_data(tiny_cfg):
    """Offline driver on the real hololens fixture (first keyframes of the
    shipped nmeas+2 index file): exercises real PNG decode, preprocessing
    with a real K, and real pose geometry through the engine."""
    from dvmvs_tpu.apps.engine import InferenceEngine
    from dvmvs_tpu.apps.run_testing import evaluate_scene

    engine = InferenceEngine("fusionnet", tiny_cfg)
    predictions, gts = evaluate_scene(
        engine, HOLOLENS, HOLOLENS_IDX, tiny_cfg, max_frames=6)
    assert len(predictions) == 6 and len(gts) == 6
    for p, g in zip(predictions, gts):
        assert p.shape == g.shape == (H_SRC, W_SRC)
        assert np.isfinite(p).all()


@pytest.mark.heavy
def test_evaluate_scene_offline_save_and_tsdf(png_scene, tiny_cfg, tmp_path):
    """Offline driver consuming an index file (incl. a TRACKING LOST line),
    npz-compatible save, then TSDF reconstruction from the saved npz."""
    from dvmvs_tpu.apps.engine import InferenceEngine
    from dvmvs_tpu.apps.run_testing import evaluate_scene
    from dvmvs_tpu.apps.run_tsdf import load_keyframe_data, reconstruct
    from dvmvs_tpu.utils.results import save_results

    scene = os.path.join(png_scene, "tinyset", "000")
    indices_dir = os.path.join(png_scene, "indices")
    os.makedirs(indices_dir, exist_ok=True)
    index_file = os.path.join(indices_dir, "keyframe+tinyset+000+nmeas+2")
    with open(index_file, "w") as f:
        f.write("00002.png 00001.png 00000.png\n")
        f.write("00004.png 00003.png 00002.png\n")
        f.write("TRACKING LOST\n")
        f.write("00008.png 00007.png 00006.png\n")

    engine = InferenceEngine("pairnet", tiny_cfg)
    predictions, gts = evaluate_scene(engine, scene, index_file, tiny_cfg)
    assert len(predictions) == 3
    assert gts is not None and len(gts) == 3
    for p in predictions:
        assert p.shape == (H_SRC, W_SRC) and np.isfinite(p).all()

    out = str(tmp_path / "results")
    mean_errors = save_results(predictions, gts, "sys", "000", out)
    assert mean_errors is not None and len(mean_errors) == 8
    pred_npz = os.path.join(out, "sys_predictions_000.npz")
    err_npz = os.path.join(out, "sys_errors_000.npz")
    assert os.path.exists(pred_npz) and os.path.exists(err_npz)
    saved = np.load(pred_npz)["arr_0"]
    assert saved.shape == (3, H_SRC, W_SRC)
    assert np.load(err_npz)["arr_0"].shape == (3, 8)

    # TSDF reconstruction from the saved predictions
    poses, images, depths, scaled_K, original_K, all_poses = load_keyframe_data(
        scene, index_file, saved, max_depth=20.0, dataset_name="tinyset")
    assert len(poses) == len(images) == len(depths) == 3
    mesh_path = str(tmp_path / "recon_complete.ply")
    volume = reconstruct(poses, images, depths, scaled_K,
                         voxel_size=0.35, mesh_path=mesh_path)
    assert os.path.exists(mesh_path)
    tsdf = np.asarray(volume.tsdf)
    assert np.isfinite(tsdf).all()
    assert (tsdf < 0.999).any(), "no voxel was ever updated"


@pytest.mark.heavy
def test_predict_scene_online_live_tsdf(png_scene, tiny_cfg, tmp_path):
    """Online driver with --live-tsdf: every accepted keyframe's prediction
    is fused into the on-device TSDF volume inside the streaming loop and a
    colored mesh is written at the end (streaming reconstruction — the
    reference only reconstructs offline from saved npz,
    sample-data/run-tsdf-reconstruction.py:477-662)."""
    from dvmvs_tpu.apps.engine import InferenceEngine
    from dvmvs_tpu.apps.run_testing_online import LiveTSDF, predict_scene

    engine = InferenceEngine("pairnet", tiny_cfg)
    scene = os.path.join(png_scene, "tinyset", "000")
    # explicit bounds covering the +x walk so the tiny volume stays tiny
    live = LiveTSDF(voxel_size=0.35, max_depth=20.0,
                    bounds=np.array([[-2.0, 6.0], [-2.0, 2.0], [0.0, 4.0]]))
    predictions, _ = predict_scene(
        engine, scene, tiny_cfg, evaluate=False, max_frames=4,
        live_tsdf=live)
    assert len(predictions) == 4
    assert live.n_integrated == len(predictions)
    tsdf = np.asarray(live.volume.tsdf)
    assert np.isfinite(tsdf).all()
    assert (tsdf < 0.999).any(), "no voxel was ever updated"

    mesh_path = str(tmp_path / "live_complete.ply")
    live.save_mesh(mesh_path)
    assert os.path.exists(mesh_path)


@pytest.mark.heavy
def test_live_tsdf_auto_bounds(png_scene, tiny_cfg):
    """Without explicit bounds the volume is allocated around the first
    keyframe's camera position with half-extent max_depth."""
    from dvmvs_tpu.apps.engine import InferenceEngine
    from dvmvs_tpu.apps.run_testing_online import LiveTSDF, predict_scene

    engine = InferenceEngine("pairnet", tiny_cfg)
    scene = os.path.join(png_scene, "tinyset", "000")
    live = LiveTSDF(voxel_size=0.5, max_depth=2.0)
    predict_scene(engine, scene, tiny_cfg, evaluate=False, max_frames=2,
                  live_tsdf=live)
    assert live.volume is not None
    ext = live.volume.vol_bnds[:, 1] - live.volume.vol_bnds[:, 0]
    assert (ext >= 2 * 2.0).all()
    # first keyframe camera sits near the origin of the +x walk
    assert abs(live.volume.vol_bnds[0, 0] - (-3.0)) < 1.5


@pytest.mark.heavy
def test_evaluate_scene_batched_matches_sequential(png_scene, tiny_cfg):
    """Throughput mode: B independent pairnet keyframes per dispatch must
    reproduce the sequential driver's predictions, with a partial final
    batch and (second pass) the batch sharded over the 8-device CPU mesh —
    multi-chip bulk eval (the reference runs one keyframe per forward on
    one GPU, pairnet/run-testing.py:95-160)."""
    from dvmvs_tpu.apps.engine import InferenceEngine
    from dvmvs_tpu.apps.run_testing import (
        evaluate_scene,
        evaluate_scene_batched,
    )
    from dvmvs_tpu.parallel.mesh import make_mesh

    scene = os.path.join(png_scene, "tinyset", "000")
    indices_dir = os.path.join(png_scene, "indices_batched")
    os.makedirs(indices_dir, exist_ok=True)
    index_file = os.path.join(indices_dir, "keyframe+tinyset+000+nmeas+2")
    with open(index_file, "w") as f:
        f.write("00002.png 00001.png 00000.png\n")
        f.write("00004.png 00003.png 00002.png\n")
        f.write("00006.png 00005.png\n")          # 1 measurement view
        f.write("TRACKING LOST\n")
        f.write("00008.png 00007.png 00006.png\n")
        f.write("00009.png 00008.png 00007.png\n")

    engine = InferenceEngine("pairnet", tiny_cfg)
    seq, seq_gts = evaluate_scene(engine, scene, index_file, tiny_cfg)

    # batch 4 over 5 keyframes -> one full + one padded partial batch
    # (f32 banks: this test pins the BATCHING logic against the f32
    # sequential path; bf16-bank parity has its own test + tolerance)
    bat, bat_gts = evaluate_scene_batched(
        engine, scene, index_file, tiny_cfg, batch_size=4,
        bank_dtype="f32")
    assert len(bat) == len(seq) == 5
    assert len(bat_gts) == len(seq_gts)
    for s, b in zip(seq, bat):
        np.testing.assert_allclose(b, s, atol=1e-4)

    # same thing sharded over the virtual 8-device mesh
    mesh = make_mesh(8)
    shard, _ = evaluate_scene_batched(
        engine, scene, index_file, tiny_cfg, batch_size=8, mesh=mesh,
        evaluate=False, bank_dtype="f32")
    for s, b in zip(seq, shard):
        np.testing.assert_allclose(b, s, atol=1e-4)


@pytest.mark.heavy
def test_evaluate_scenes_batched_fusion_matches_sequential(png_scene, tiny_cfg):
    """Scene-parallel fusionnet bulk eval: two scenes with DIFFERENT
    keyframe schedules (one containing a TRACKING LOST reset, different
    lengths) advance in lockstep; every per-scene prediction must match
    the sequential driver, including post-reset recurrent state."""
    from dvmvs_tpu.apps.engine import InferenceEngine
    from dvmvs_tpu.apps.run_testing import (
        evaluate_scene,
        evaluate_scenes_batched_fusion,
    )
    from dvmvs_tpu.parallel.mesh import make_mesh

    scene = os.path.join(png_scene, "tinyset", "000")
    indices_dir = os.path.join(png_scene, "indices_fusion_batched")
    os.makedirs(indices_dir, exist_ok=True)
    idx_a = os.path.join(indices_dir, "keyframe+tinyset+000+nmeas+2")
    with open(idx_a, "w") as f:
        f.write("00002.png 00001.png 00000.png\n")
        f.write("00004.png 00003.png 00002.png\n")
        f.write("TRACKING LOST\n")
        f.write("00008.png 00007.png 00006.png\n")
    idx_b = os.path.join(indices_dir, "keyframe+tinyset+001+nmeas+2")
    with open(idx_b, "w") as f:
        f.write("00001.png 00000.png\n")
        f.write("00003.png 00002.png 00001.png\n")
        f.write("00005.png 00004.png 00003.png\n")
        f.write("00007.png 00006.png 00005.png\n")

    engine = InferenceEngine("fusionnet", tiny_cfg)
    seq_a, gts_a = evaluate_scene(engine, scene, idx_a, tiny_cfg)
    seq_b, _ = evaluate_scene(engine, scene, idx_b, tiny_cfg)

    results = evaluate_scenes_batched_fusion(
        engine, [(scene, idx_a), (scene, idx_b)], tiny_cfg,
        bank_dtype="f32")
    bat_a, bat_gts_a = results[0]
    bat_b, _ = results[1]
    assert len(bat_a) == len(seq_a) == 3
    assert len(bat_b) == len(seq_b) == 4
    assert len(bat_gts_a) == len(gts_a)
    for s, b in zip(seq_a + seq_b, bat_a + bat_b):
        np.testing.assert_allclose(b, s, atol=1e-4)

    # sharded over a 2-device mesh (batch == scenes == 2)
    mesh = make_mesh(2)
    results = evaluate_scenes_batched_fusion(
        engine, [(scene, idx_a), (scene, idx_b)], tiny_cfg, mesh=mesh,
        evaluate=False, bank_dtype="f32")
    for s, b in zip(seq_a + seq_b, results[0][0] + results[1][0]):
        np.testing.assert_allclose(b, s, atol=1e-4)


@pytest.mark.heavy
def test_evaluate_scenes_batched_fusion_empty_and_duplicate_jobs(
        png_scene, tiny_cfg):
    """Degenerate lockstep jobs: an index file with only TRACKING LOST
    yields empty results (the sequential driver's behavior) without
    aborting the batch, and duplicated jobs (main() pads the final group
    that way) alias to one parsed scene and return identical results."""
    from dvmvs_tpu.apps.engine import InferenceEngine
    from dvmvs_tpu.apps.run_testing import evaluate_scenes_batched_fusion

    scene = os.path.join(png_scene, "tinyset", "000")
    indices_dir = os.path.join(png_scene, "indices_fusion_degenerate")
    os.makedirs(indices_dir, exist_ok=True)
    idx = os.path.join(indices_dir, "keyframe+tinyset+000+nmeas+2")
    with open(idx, "w") as f:
        f.write("00002.png 00001.png 00000.png\n")
        f.write("00004.png 00003.png 00002.png\n")
    idx_empty = os.path.join(indices_dir, "keyframe+tinyset+002+nmeas+2")
    with open(idx_empty, "w") as f:
        f.write("TRACKING LOST\n")

    engine = InferenceEngine("fusionnet", tiny_cfg)
    results = evaluate_scenes_batched_fusion(
        engine,
        [(scene, idx), (scene, idx_empty), (scene, idx)],  # dup of job 0
        tiny_cfg)
    assert len(results[0][0]) == 2
    assert results[1][0] == [] and len(results[1][1] or []) == 0
    assert len(results[2][0]) == 2
    for a, b in zip(results[0][0], results[2][0]):
        np.testing.assert_allclose(a, b, atol=1e-6)

    # all-empty batch short-circuits
    results = evaluate_scenes_batched_fusion(
        engine, [(scene, idx_empty)], tiny_cfg)
    assert results == [([], [])]


def test_scene_assets_cache_bounded(png_scene, tiny_cfg):
    """SceneAssets caps its preprocessed-frame cache (long ScanNet scenes
    must not pin gigabytes of float32 frames) and serves identical arrays
    from cache and from a fresh decode."""
    from dvmvs_tpu.apps.run_testing import SceneAssets

    scene = os.path.join(png_scene, "tinyset", "000")
    a = SceneAssets(scene, tiny_cfg, cache_frames=3)
    names = [f"{i:05d}.png" for i in range(6)]
    first_pass = [np.array(a.image(n)) for n in names]
    assert len(a._cache) <= 3
    for n, want in zip(names, first_pass):
        np.testing.assert_array_equal(a.image(n), want)
    assert a.image(names[-1]) is a.image(names[-1])  # cache hit
    assert a.gt_depth(names[0]).shape == first_pass[0].shape[:2]


def test_feature_cache_bounded(png_scene, tiny_cfg):
    """evaluate_scene caps its device-side measurement-feature cache the
    same way SceneAssets caps its host frame cache: on a long scene with
    more distinct measurement frames than the cap, evictions must occur
    (visible as re-encodes) and predictions must be identical to an
    unbounded run — the encoder is deterministic, so a re-encoded frame
    yields bit-identical features. (The reference streams per-frame with no
    cache at all: dvmvs/fusionnet/run-testing.py:95-108.)"""
    from dvmvs_tpu.apps.engine import InferenceEngine
    from dvmvs_tpu.apps.run_testing import evaluate_scene

    scene = os.path.join(png_scene, "tinyset", "000")
    # 8 keyframes x 2 measurements: one measurement is fresh per line, the
    # other (frame valid[0]) is shared by every line — an unbounded cache
    # encodes it once, a 2-entry cache keeps evicting and re-encoding it
    valid = [i for i in range(N_FRAMES)
             if not (LOST_START <= i < LOST_END)][:18]
    idx = os.path.join(png_scene, "idx_longscene")
    with open(idx, "w") as f:
        for j in range(2, 18, 2):
            f.write(f"{valid[j]:05d}.png {valid[j - 1]:05d}.png "
                    f"{valid[0]:05d}.png\n")

    engine = InferenceEngine("pairnet", tiny_cfg)
    encode_calls = []
    real_encode = engine.encode
    engine.encode = lambda img: (encode_calls.append(1) or
                                 real_encode(img))

    preds_unbounded, _ = evaluate_scene(
        engine, scene, idx, tiny_cfg, evaluate=False, cache_features=64)
    n_unbounded = len(encode_calls)

    encode_calls.clear()
    preds_capped, _ = evaluate_scene(
        engine, scene, idx, tiny_cfg, evaluate=False, cache_features=2)
    n_capped = len(encode_calls)

    assert n_capped > n_unbounded  # evictions really happened
    assert len(preds_capped) == len(preds_unbounded) == 8
    for a, b in zip(preds_unbounded, preds_capped):
        np.testing.assert_array_equal(a, b)


def test_scan_schedule():
    """Chunk schedule: full chunks + pow2 tail, never exceeding scan_chunk,
    total >= T with bounded padding (the B>=8 chunk-tail throughput fix)."""
    from dvmvs_tpu.apps.run_testing import _scan_schedule

    assert _scan_schedule(32, 16) == [16, 16]
    assert _scan_schedule(33, 16) == [16, 16, 1]
    assert _scan_schedule(37, 16) == [16, 16, 8]   # tail 5 -> pow2 8
    assert _scan_schedule(18, 16) == [16, 2]
    assert _scan_schedule(3, 16) == [4]
    assert _scan_schedule(23, 24) == [24]          # pow2 clamped to chunk
    for T in range(1, 70):
        for chunk in (4, 16, 24):
            s = _scan_schedule(T, chunk)
            assert sum(s) >= T and all(c <= chunk for c in s)
            assert sum(s) - T < max(c for c in s)


def test_bank_bf16_parity(png_scene, tiny_cfg):
    """bf16 feature banks (the default in the batched/scanned throughput
    modes — halves HBM residency at B=16 scene-batch serving) must
    reproduce f32-bank depths to well under the metric noise floor. The
    bound asserted here (max |Δd| <= 1e-2 m on 0.25-20 m depths, i.e.
    <0.05% of range at random init) documents the cast cost; trained-
    checkpoint parity on hardware is recorded in docs/PERF.md."""
    from dvmvs_tpu.apps.engine import InferenceEngine
    from dvmvs_tpu.apps.run_testing import (
        evaluate_scene_batched,
        evaluate_scenes_batched_fusion,
    )

    scene = os.path.join(png_scene, "tinyset", "000")
    indices_dir = os.path.join(png_scene, "indices_bf16")
    os.makedirs(indices_dir, exist_ok=True)
    idx = os.path.join(indices_dir, "keyframe+tinyset+000+nmeas+2")
    with open(idx, "w") as f:
        f.write("00002.png 00001.png 00000.png\n")
        f.write("00004.png 00003.png 00002.png\n")
        f.write("00006.png 00005.png 00004.png\n")

    engine = InferenceEngine("pairnet", tiny_cfg)
    f32, _ = evaluate_scene_batched(
        engine, scene, idx, tiny_cfg, batch_size=2, evaluate=False,
        bank_dtype="f32")
    b16, _ = evaluate_scene_batched(
        engine, scene, idx, tiny_cfg, batch_size=2, evaluate=False,
        bank_dtype="bf16")
    for a, b in zip(f32, b16):
        assert np.abs(a - b).max() <= 1e-2

    engine = InferenceEngine("fusionnet", tiny_cfg)
    f32 = evaluate_scenes_batched_fusion(
        engine, [(scene, idx)], tiny_cfg, evaluate=False,
        bank_dtype="f32")[0][0]
    b16 = evaluate_scenes_batched_fusion(
        engine, [(scene, idx)], tiny_cfg, evaluate=False,
        bank_dtype="bf16")[0][0]
    for a, b in zip(f32, b16):
        assert np.abs(a - b).max() <= 1e-2


@pytest.mark.heavy
def test_batched_eval_with_prewarmed_assets(png_scene, tiny_cfg):
    """Passing a pre-built SceneAssets / asset_cache into the batched
    evaluators (the warm path of scripts/bench_serving_throughput.py)
    must reproduce the cold-path predictions and actually reuse the
    caller's objects (no re-decode of the scene)."""
    from dvmvs_tpu.apps.engine import InferenceEngine
    from dvmvs_tpu.apps.run_testing import (
        SceneAssets,
        evaluate_scene_batched,
        evaluate_scenes_batched_fusion,
    )

    scene = os.path.join(png_scene, "tinyset", "000")
    indices_dir = os.path.join(png_scene, "indices_warm")
    os.makedirs(indices_dir, exist_ok=True)
    idx = os.path.join(indices_dir, "keyframe+tinyset+000+nmeas+2")
    with open(idx, "w") as f:
        f.write("00002.png 00001.png 00000.png\n")
        f.write("00004.png 00003.png 00002.png\n")

    engine = InferenceEngine("pairnet", tiny_cfg)
    cold, _ = evaluate_scene_batched(
        engine, scene, idx, tiny_cfg, batch_size=2, evaluate=False)
    assets = SceneAssets(scene, tiny_cfg, evaluate=False)
    for n in assets.image_filenames:
        assets.image(n)
    n_cached = len(assets._cache)
    warm, _ = evaluate_scene_batched(
        engine, scene, idx, tiny_cfg, batch_size=2, evaluate=False,
        assets=assets)
    assert len(assets._cache) == n_cached  # nothing re-decoded
    for c, w in zip(cold, warm):
        np.testing.assert_allclose(w, c, atol=1e-6)

    engine = InferenceEngine("fusionnet", tiny_cfg)
    cold = evaluate_scenes_batched_fusion(
        engine, [(scene, idx)], tiny_cfg, evaluate=False)
    cache = {os.path.abspath(scene): assets}
    warm = evaluate_scenes_batched_fusion(
        engine, [(scene, idx)], tiny_cfg, evaluate=False,
        asset_cache=cache)
    assert cache[os.path.abspath(scene)] is assets  # reused, not replaced
    for c, w in zip(cold[0][0], warm[0][0]):
        np.testing.assert_allclose(w, c, atol=1e-6)


@pytest.mark.heavy
def test_scanned_bulk_eval_matches_per_dispatch(png_scene, tiny_cfg):
    """scan_chunk > 0 folds T batches/steps into one lax.scan dispatch
    over a device-resident image+feature bank (engine._predict_pair_scan /
    _fusion_scan). Predictions must match the per-dispatch bulk paths,
    covering: a padded partial final batch, a chunk that splits the scan
    (recurrent state threaded across dispatches), a chunk larger than T
    (scan-side padding), a single-view entry, and a TRACKING LOST reset."""
    from dvmvs_tpu.apps.engine import InferenceEngine
    from dvmvs_tpu.apps.run_testing import (
        evaluate_scene_batched,
        evaluate_scenes_batched_fusion,
    )

    scene = os.path.join(png_scene, "tinyset", "000")
    indices_dir = os.path.join(png_scene, "indices_scan")
    os.makedirs(indices_dir, exist_ok=True)
    idx_a = os.path.join(indices_dir, "keyframe+tinyset+000+nmeas+2")
    with open(idx_a, "w") as f:
        f.write("00002.png 00001.png 00000.png\n")
        f.write("00004.png 00003.png 00002.png\n")
        f.write("00006.png 00005.png\n")          # 1 measurement view
        f.write("TRACKING LOST\n")
        f.write("00008.png 00007.png 00006.png\n")
        f.write("00009.png 00008.png 00007.png\n")
    idx_b = os.path.join(indices_dir, "keyframe+tinyset+001+nmeas+2")
    with open(idx_b, "w") as f:
        f.write("00001.png 00000.png\n")
        f.write("00003.png 00002.png 00001.png\n")
        f.write("00005.png 00004.png 00003.png\n")

    # pairnet: 5 keyframes, B=2 -> T=3 batches (last padded);
    # chunk 2 splits the scan, chunk 8 pads it
    engine = InferenceEngine("pairnet", tiny_cfg)
    base, base_gts = evaluate_scene_batched(
        engine, scene, idx_a, tiny_cfg, batch_size=2)
    for chunk in (2, 8):
        scanned, gts = evaluate_scene_batched(
            engine, scene, idx_a, tiny_cfg, batch_size=2, scan_chunk=chunk)
        assert len(scanned) == len(base) == 5
        assert len(gts) == len(base_gts)
        for s, b in zip(base, scanned):
            np.testing.assert_allclose(b, s, atol=1e-5)

    # fusionnet: 2 scenes, different lengths + a reset; chunk 2 threads the
    # carry across dispatches, chunk 16 pads past both scene ends
    engine = InferenceEngine("fusionnet", tiny_cfg)
    base = evaluate_scenes_batched_fusion(
        engine, [(scene, idx_a), (scene, idx_b)], tiny_cfg)
    for chunk in (2, 16):
        scanned = evaluate_scenes_batched_fusion(
            engine, [(scene, idx_a), (scene, idx_b)], tiny_cfg,
            scan_chunk=chunk)
        for (bp, bg), (sp, sg) in zip(base, scanned):
            assert len(bp) == len(sp)
            assert (bg is None) == (sg is None)
            for s, b in zip(bp, sp):
                np.testing.assert_allclose(b, s, atol=1e-5)
