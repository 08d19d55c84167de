"""Bulk offline evaluation over pre-computed keyframe index files
(reference: dvmvs/fusionnet/run-testing.py, dvmvs/pairnet/run-testing.py).

Iterates ``<data>/indices/keyframe+<dataset>+<scene>+nmeas+<N>`` files; per
line loads the reference + measurement frames by filename, preprocesses,
predicts, and saves predictions + 8 error metrics as npz. Fusionnet resets
its recurrent state on ``TRACKING LOST`` lines.

TPU-native differences from the reference loop:
  - measurement features are cached per filename (device-resident), so each
    image runs the backbone exactly once per scene;
  - the previous depth stays on device between keyframes (the hypothesis
    splat runs inside the jitted step).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import numpy as np

from dvmvs_tpu.config import MEAN_RGB, SCALE_RGB, STD_RGB, TestConfig
from dvmvs_tpu.data.io import load_depth_png, load_image
from dvmvs_tpu.data.preprocess import PreprocessImage
from dvmvs_tpu.apps.engine import InferenceEngine
from dvmvs_tpu.utils.results import InferenceTimer, save_results


class SceneAssets:
    """Shared scene loading for the three evaluators: intrinsics, poses,
    filename indices, preprocessor, and a BOUNDED cache of preprocessed
    frames (the batched drivers revisit frames; an unbounded float32 cache
    would pin GBs of host RAM on long ScanNet scenes)."""

    def __init__(self, scene_folder: str, cfg: TestConfig,
                 evaluate: bool = True, cache_frames: int = 512):
        self.K_raw = np.loadtxt(
            os.path.join(scene_folder, "K.txt")).astype(np.float32)
        self.poses = np.fromfile(
            os.path.join(scene_folder, "poses.txt"),
            dtype=float, sep="\n ").reshape(-1, 4, 4)
        self.images_dir = os.path.join(scene_folder, "images")
        self.image_filenames = sorted(
            f for f in os.listdir(self.images_dir) if f.endswith(".png"))
        self.frame_index = {f: i for i, f in enumerate(self.image_filenames)}
        depth_dir = os.path.join(scene_folder, "depth")
        self.depth_dir = depth_dir
        self.depth_filenames = (
            sorted(f for f in os.listdir(depth_dir) if f.endswith(".png"))
            if evaluate and os.path.isdir(depth_dir) else None)

        first = load_image(os.path.join(
            self.images_dir, self.image_filenames[0]))
        self.preprocessor = PreprocessImage(
            K=self.K_raw, old_width=first.shape[1], old_height=first.shape[0],
            new_width=cfg.image_width, new_height=cfg.image_height,
            distortion_crop=cfg.distortion_crop,
            perform_crop=cfg.perform_crop)
        self.updated_K = self.preprocessor.get_updated_intrinsics().astype(
            np.float32)
        self._cache: Dict[str, np.ndarray] = {}
        self._order: list = []
        self._cap = cache_frames

    def image(self, name: str) -> np.ndarray:
        """Preprocessed float32 frame, LRU-cached up to cache_frames."""
        hit = self._cache.get(name)
        if hit is not None:
            return hit
        img = self.preprocessor.apply_rgb(
            load_image(os.path.join(self.images_dir, name)),
            SCALE_RGB, MEAN_RGB, STD_RGB).astype(np.float32)
        if len(self._order) >= self._cap:
            self._cache.pop(self._order.pop(0), None)
        self._cache[name] = img
        self._order.append(name)
        return img

    def gt_depth(self, ref_name: str) -> Optional[np.ndarray]:
        if self.depth_filenames is None:
            return None
        d = load_depth_png(os.path.join(
            self.depth_dir, self.depth_filenames[self.frame_index[ref_name]]))
        return self.preprocessor.apply_depth(d)

    def pose(self, name: str) -> np.ndarray:
        return self.poses[self.frame_index[name]]


def evaluate_scene(
    engine: InferenceEngine,
    scene_folder: str,
    index_file: str,
    cfg: TestConfig,
    evaluate: bool = True,
    max_frames: Optional[int] = None,
    cache_features: int = 384,
):
    with open(index_file) as f:
        lines = [l for l in f.read().splitlines() if l]

    assets = SceneAssets(scene_folder, cfg, evaluate)

    predictions = []
    reference_depths = [] if assets.depth_filenames is not None else None
    # BOUNDED device-side LRU of half-res measurement features, mirroring
    # the host frame cache in SceneAssets: one entry is ~2.6 MB f32 at
    # 320x256, and a long ScanNet scene can reference thousands of distinct
    # measurement frames — unbounded, that pins GBs of HBM next to the
    # model. 384 entries ~= 1 GB. The keyframe heuristic reuses only a
    # ~30-frame window of recent measurements, so evictions are cold in
    # practice; a re-encoded frame yields bit-identical features (the
    # encoder is deterministic), so results do not depend on the cap.
    feature_cache: Dict[str, object] = {}
    feature_order: list = []
    timer = InferenceTimer()

    engine.reset()
    for line_i, line in enumerate(lines):
        if max_frames is not None and len(predictions) >= max_frames:
            break
        if line == "TRACKING LOST":
            engine.reset()
            continue
        filenames = line.split(" ")
        ref_name, meas_names = filenames[0], filenames[1:]

        ref_image = assets.image(ref_name)
        if reference_depths is not None:
            reference_depths.append(assets.gt_depth(ref_name))

        timer.record_start_time()
        ref_feats = engine.encode(ref_image)

        meas_half, meas_poses = [], []
        for m in meas_names:
            hit = feature_cache.get(m)
            if hit is None:
                hit = engine.encode(assets.image(m))[0]
                if len(feature_order) >= cache_features:
                    feature_cache.pop(feature_order.pop(0), None)
                feature_cache[m] = hit
                feature_order.append(m)
            meas_half.append(hit)
            meas_poses.append(assets.pose(m))

        depth = engine.predict(
            ref_image, ref_feats, meas_half, assets.pose(ref_name),
            meas_poses, assets.updated_K)
        timer.record_end_time_and_elapsed_time()
        predictions.append(depth)

        if cfg.visualize:
            # reference Config.test_visualize (fusionnet/run-testing.py)
            from dvmvs_tpu.utils import visualization as viz

            meas_image = assets.image(meas_names[0])
            if viz.display_available():
                viz.visualize_predictions(
                    ref_image, meas_image, depth, MEAN_RGB, STD_RGB, SCALE_RGB)
            else:
                viz.save_visualization(
                    "visualizations", len(predictions) - 1, ref_image,
                    meas_image, depth, MEAN_RGB, STD_RGB, SCALE_RGB)

    timer.print_statistics()
    return predictions, reference_depths


def _scan_schedule(T: int, scan_chunk: int):
    """Chunk lengths for folding T steps into lax.scan dispatches: full
    scan_chunk chunks plus a TAIL chunk rounded up to the next power of
    two instead of a full chunk. Rounding T up to a scan_chunk multiple
    wasted up to (scan_chunk-1) padded steps — the measured B>=8 pairnet
    throughput dip — while an exact tail would compile one program per
    distinct tail length; pow2 tails bound the extra compiles at
    log2(scan_chunk) and the padding at the tail's own size."""
    full, rem = divmod(T, scan_chunk)
    sched = [scan_chunk] * full
    if rem:
        sched.append(min(1 << (rem - 1).bit_length(), scan_chunk))
    return sched


def _bank_dtype(name: str):
    import jax.numpy as jnp

    return {"bf16": jnp.bfloat16, "f32": jnp.float32}[name]


def evaluate_scene_batched(
    engine: InferenceEngine,
    scene_folder: str,
    index_file: str,
    cfg: TestConfig,
    batch_size: int,
    mesh=None,
    evaluate: bool = True,
    max_frames: Optional[int] = None,
    assets: Optional["SceneAssets"] = None,
    scan_chunk: int = 0,
    bank_dtype: str = "bf16",
):
    """Throughput mode (pairnet only): pack B independent keyframes per
    dispatch, optionally sharded over a device mesh — multi-chip bulk
    evaluation with one compiled program. Unique scene images are encoded
    exactly once into a device-resident feature bank; keyframe batches
    gather from it with ``jnp.take``. The reference evaluates one keyframe
    per forward on one GPU (pairnet/run-testing.py:95-160).

    ``assets``: optionally pass a pre-built (and pre-warmed) SceneAssets
    for the scene so repeated bulk evals — different models/batch sizes
    over the same scene — skip the host decode+resize pass (the dominant
    cost on weak hosts; see scripts/bench_serving_throughput.py).

    ``scan_chunk`` > 0: fold that many consecutive keyframe batches into
    ONE dispatch (jax.lax.scan over a device-resident image array +
    feature bank, engine._predict_pair_scan) instead of one dispatch per
    batch — removes the fixed per-dispatch host round-trip that bounds
    wall throughput at small B. Single-device only (mesh must be None);
    numerics identical to the per-dispatch path."""
    import time

    import jax
    import jax.numpy as jnp

    assert engine.kind == "pairnet", "batched eval needs a stateless model"
    V = cfg.n_measurement_frames

    with open(index_file) as f:
        lines = [l for l in f.read().splitlines() if l]
    entries = [l.split(" ") for l in lines if l != "TRACKING LOST"]
    if max_frames is not None:
        entries = entries[:max_frames]
    if not entries:
        return [], ([] if evaluate else None)

    if assets is None:
        assets = SceneAssets(scene_folder, cfg, evaluate)
    unique = list(dict.fromkeys(n for e in entries for n in e))
    updated_K = assets.updated_K

    sharding = None
    if mesh is not None:
        from dvmvs_tpu.parallel.mesh import batch_sharding, replicated_sharding
        sharding = batch_sharding(mesh)
        engine.variables = jax.device_put(
            engine.variables, replicated_sharding(mesh))

    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, sharding) if sharding is not None else x

    def pad_to(arr_list, n):
        return arr_list + [arr_list[-1]] * (n - len(arr_list))

    if scan_chunk:
        assert mesh is None, "scan_chunk is single-device (use per-batch " \
                             "dispatch for mesh-sharded bulk eval)"
        B = batch_size
        t0 = time.perf_counter()
        # unique images live on device once; every scanned step gathers its
        # reference rows from here instead of shipping (B,H,W,3) per batch
        pad_u = -(-len(unique) // B) * B
        img_np = np.stack([assets.image(n) for n in pad_to(unique, pad_u)])
        images = jnp.asarray(img_np)
        feats = engine._extract_scan(
            engine.variables, images.reshape((pad_u // B, B) + img_np.shape[1:]))
        # bf16 bank (default): halves HBM residency and gather bandwidth;
        # the engine casts to f32 at consumption (parity pinned by
        # tests/test_drivers_e2e.py::test_bank_bf16_parity)
        bdt = _bank_dtype(bank_dtype)
        bank = tuple(
            f.reshape((pad_u,) + f.shape[2:]).astype(bdt) for f in feats)
        bank_index = {n: i for i, n in enumerate(unique)}

        T = -(-len(entries) // B)
        schedule = _scan_schedule(T, scan_chunk)
        T_pad = sum(schedule)
        packed = pad_to(list(entries), T_pad * B)
        ref_idx = np.zeros((T_pad, B), np.int32)
        meas_idx = np.zeros((T_pad, B, V), np.int32)
        view_mask = np.zeros((T_pad, B, V), np.float32)
        ref_pose = np.zeros((T_pad, B, 4, 4), np.float32)
        meas_pose = np.zeros((T_pad, B, V, 4, 4), np.float32)
        for i, e in enumerate(packed):
            t, bi = divmod(i, B)
            names = list(e[1:])[:V]
            view_mask[t, bi, :len(names)] = 1.0
            names = pad_to(names, V)
            ref_idx[t, bi] = bank_index[e[0]]
            meas_idx[t, bi] = [bank_index[n] for n in names]
            ref_pose[t, bi] = assets.pose(e[0])
            meas_pose[t, bi] = [assets.pose(n) for n in names]
        K_b = jnp.tile(jnp.asarray(updated_K)[None], (B, 1, 1))

        depths = []
        c = 0
        for step in schedule:
            xs = dict(
                ref_idx=jnp.asarray(ref_idx[c:c + step]),
                meas_idx=jnp.asarray(meas_idx[c:c + step]),
                view_mask=jnp.asarray(view_mask[c:c + step]),
                ref_pose=jnp.asarray(ref_pose[c:c + step]),
                meas_pose=jnp.asarray(meas_pose[c:c + step]))
            out = engine._predict_pair_scan(
                engine.variables, bank, images, K_b, xs)
            depths.append(np.asarray(out).reshape(-1, *out.shape[2:]))
            c += step
        predictions = list(np.concatenate(depths)[:len(entries)])
        reference_depths = None
        if assets.depth_filenames is not None:
            reference_depths = [assets.gt_depth(e[0]) for e in entries]
        dt = time.perf_counter() - t0
        print(f"batched eval: {len(entries)} keyframes in {dt:.2f}s "
              f"({len(entries) / dt:.1f} images/s, batch {batch_size}, "
              f"scan {scan_chunk})")
        return predictions, reference_depths

    # ---- device: encode the unique images in batches into a feature bank
    t0 = time.perf_counter()
    bank_chunks = []
    for s in range(0, len(unique), batch_size):
        chunk = pad_to(unique[s:s + batch_size], batch_size)
        imgs = put(np.stack([assets.image(n) for n in chunk]))
        bank_chunks.append(engine._extract(engine.variables, imgs))
    n_scales = len(bank_chunks[0])
    bdt = _bank_dtype(bank_dtype)
    bank = tuple(
        jnp.concatenate(
            [c[i].astype(bdt) for c in bank_chunks], axis=0)[:len(unique)]
        for i in range(n_scales))
    bank_index = {n: i for i, n in enumerate(unique)}

    # ---- device: batched predictions
    predictions = []
    reference_depths = [] if assets.depth_filenames is not None else None
    for s in range(0, len(entries), batch_size):
        batch = entries[s:s + batch_size]
        n_real = len(batch)
        batch = pad_to(batch, batch_size)

        ref_idx = np.array([bank_index[e[0]] for e in batch])
        ref_feats = tuple(
            jnp.take(b, put(ref_idx), axis=0).astype(jnp.float32)
            for b in bank)
        ref_images = put(np.stack([assets.image(e[0]) for e in batch]))
        ref_poses = put(np.stack(
            [assets.pose(e[0]) for e in batch]).astype(np.float32))

        meas_idx, mposes, mask = [], [], np.zeros(
            (batch_size, V), np.float32)
        for bi, e in enumerate(batch):
            names = e[1:][:V]
            mask[bi, :len(names)] = 1.0
            names = pad_to(list(names), V)
            meas_idx.append([bank_index[n] for n in names])
            mposes.append([assets.pose(n) for n in names])
        meas_half = jnp.take(
            bank[0], put(np.array(meas_idx)), axis=0).astype(jnp.float32)
        mposes = put(np.asarray(mposes, np.float32))

        depth = engine.predict_batch(
            ref_images, ref_feats, meas_half, ref_poses, mposes,
            put(np.tile(updated_K[None], (batch_size, 1, 1))), put(mask))
        depth = np.asarray(depth)[:n_real]
        predictions.extend(list(depth))

        if reference_depths is not None:
            for e in batch[:n_real]:
                reference_depths.append(assets.gt_depth(e[0]))

    dt = time.perf_counter() - t0
    print(f"batched eval: {len(entries)} keyframes in {dt:.2f}s "
          f"({len(entries) / dt:.1f} images/s, batch {batch_size}"
          f"{', mesh ' + str(mesh.shape) if mesh is not None else ''})")
    return predictions, reference_depths


def evaluate_scenes_batched_fusion(
    engine: InferenceEngine,
    jobs,
    cfg: TestConfig,
    mesh=None,
    evaluate: bool = True,
    max_frames: Optional[int] = None,
    asset_cache: Optional[Dict[str, "SceneAssets"]] = None,
    scan_chunk: int = 0,
    bank_dtype: str = "bf16",
):
    """Scene-parallel fusionnet bulk eval: B INDEPENDENT scenes advance in
    lockstep, one batched recurrent step per dispatch, optionally sharded
    over a device mesh. The recurrence is per-scene state, so scenes are
    the natural parallel axis for the flagship model (the reference runs
    one scene at a time on one GPU, fusionnet/run-testing.py:62-234).
    ``TRACKING LOST`` becomes a per-scene keep-mask zeroing that scene's
    carry before its next step — identical semantics to the sequential
    driver's engine.reset(). ``jobs``: list of (scene_folder, index_file).
    Returns a list of (predictions, gts) aligned with jobs.

    ``asset_cache``: optional dict keyed by abspath(scene_folder) that
    SceneAssets are reused from / inserted into, so repeated bulk evals
    over the same scenes skip the host decode+resize pass.

    ``scan_chunk`` > 0: fold that many lockstep steps into ONE dispatch
    (jax.lax.scan threading the recurrent state, engine._fusion_scan)
    instead of one dispatch per step — the recurrent state never leaves
    the device and the fixed per-dispatch host round-trip is paid once
    per chunk. Single-device only; numerics identical."""
    import time

    import jax
    import jax.numpy as jnp

    assert engine.kind == "fusionnet"
    B = len(jobs)
    V = cfg.n_measurement_frames

    # alias duplicate jobs (main() pads the final group by repeating the
    # last index file) to ONE parsed scene — shared host preprocessing and
    # shared feature-bank entries; the duplicate batch rows still compute,
    # but nothing is loaded or encoded twice
    uniq_key: Dict[tuple, int] = {}
    scene_of = []
    uniq_jobs = []
    for scene_folder, index_file in jobs:
        key = (os.path.abspath(scene_folder), os.path.abspath(index_file))
        if key not in uniq_key:
            uniq_key[key] = len(uniq_jobs)
            uniq_jobs.append((scene_folder, index_file))
        scene_of.append(uniq_key[key])

    sdata = []
    for scene_folder, index_file in uniq_jobs:
        with open(index_file) as f:
            lines = [l for l in f.read().splitlines() if l]
        steps = []
        pending_reset = False
        for l in lines:
            if l == "TRACKING LOST":
                pending_reset = True
                continue
            names = l.split(" ")
            steps.append((pending_reset, names[0], names[1:]))
            pending_reset = False
        if max_frames is not None:
            steps = steps[:max_frames]
        unique = list(dict.fromkeys(
            n for (_, r, ms) in steps for n in [r] + list(ms)))
        akey = os.path.abspath(scene_folder)
        if asset_cache is not None and akey in asset_cache:
            scene_assets = asset_cache[akey]
        else:
            scene_assets = SceneAssets(scene_folder, cfg, evaluate)
            if asset_cache is not None:
                asset_cache[akey] = scene_assets
        sdata.append(dict(steps=steps, unique=unique, assets=scene_assets))

    # a scene with no usable keyframes (empty index / only TRACKING LOST /
    # --max-frames 0) yields empty results; its batch row replays a live
    # scene's inputs so the lockstep stays well-formed
    live = [u for u in range(len(sdata)) if sdata[u]["steps"]]
    if not live:
        return [([], [] if evaluate else None) for _ in jobs]
    eff_of = [scene_of[si] if sdata[scene_of[si]]["steps"] else live[0]
              for si in range(B)]

    if scan_chunk:
        return _fusion_eval_scanned(
            engine, jobs, cfg, sdata, scene_of, eff_of, live, scan_chunk,
            mesh, bank_dtype=bank_dtype)

    sharding = None
    if mesh is not None:
        from dvmvs_tpu.parallel.mesh import batch_sharding, replicated_sharding
        sharding = batch_sharding(mesh)
        engine.variables = jax.device_put(
            engine.variables, replicated_sharding(mesh))

    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, sharding) if sharding is not None else x

    # global feature bank over (unique scene, name), encoded in B chunks
    t0 = time.perf_counter()
    flat = [(uj, n) for uj in range(len(sdata)) for n in sdata[uj]["unique"]]
    bank_index = {key: gi for gi, key in enumerate(flat)}
    chunks = []
    for s in range(0, len(flat), B):
        chunk = flat[s:s + B]
        chunk = chunk + [chunk[-1]] * (B - len(chunk))
        imgs = put(np.stack(
            [sdata[uj]["assets"].image(n) for uj, n in chunk]))
        chunks.append(engine._extract(engine.variables, imgs))
    bdt = _bank_dtype(bank_dtype)
    bank = tuple(
        jnp.concatenate(
            [c[i].astype(bdt) for c in chunks], axis=0)[:len(flat)]
        for i in range(len(chunks[0])))

    state = jax.tree_util.tree_map(put, engine.init_batch_state(B))
    results = [
        ([], [] if sdata[scene_of[si]]["assets"].depth_filenames is not None
         else None)
        for si in range(B)]
    max_steps = max(len(sdata[u]["steps"]) for u in live)
    n_predicted = 0

    for t in range(max_steps):
        keep = np.ones((B,), np.float32)
        mask = np.zeros((B, V), np.float32)
        ref_idx, meas_idx = [], []
        ref_images, ref_poses, mposes, Ks = [], [], [], []
        for si in range(B):
            u = eff_of[si]
            s = sdata[u]
            a = s["assets"]
            reset, ref, ms = s["steps"][min(t, len(s["steps"]) - 1)]
            if t < len(s["steps"]) and reset:
                keep[si] = 0.0
            # padded steps (scene already finished) replay the last entry
            # with a normal mask — well-formed compute, outputs dropped
            names = list(ms)[:V]
            mask[si, :len(names)] = 1.0
            names = names + [names[0]] * (V - len(names))
            ref_idx.append(bank_index[(u, ref)])
            meas_idx.append([bank_index[(u, n)] for n in names])
            ref_images.append(a.image(ref))
            ref_poses.append(a.pose(ref))
            mposes.append([a.pose(n) for n in names])
            Ks.append(a.updated_K)

        ref_feats = tuple(
            jnp.take(b, put(np.array(ref_idx)), axis=0).astype(jnp.float32)
            for b in bank)
        meas_half = jnp.take(
            bank[0], put(np.array(meas_idx)), axis=0).astype(jnp.float32)
        depth, state = engine.fusion_step_batch(
            put(np.stack(ref_images)), ref_feats, meas_half,
            put(np.stack(ref_poses).astype(np.float32)),
            put(np.asarray(mposes, np.float32)), put(np.stack(Ks)),
            put(mask), state, put(keep))
        depth = np.asarray(depth)

        for si in range(B):
            own = sdata[scene_of[si]]
            if t >= len(own["steps"]):
                continue
            results[si][0].append(depth[si])
            n_predicted += 1
            if results[si][1] is not None:
                _, ref, _ = own["steps"][t]
                results[si][1].append(own["assets"].gt_depth(ref))

    dt = time.perf_counter() - t0
    print(f"scene-batched eval: {n_predicted} keyframes over {B} scenes in "
          f"{dt:.2f}s ({n_predicted / dt:.1f} images/s"
          f"{', mesh ' + str(mesh.shape) if mesh is not None else ''})")
    return results


def _fusion_eval_scanned(engine, jobs, cfg, sdata, scene_of, eff_of, live,
                         scan_chunk, mesh, bank_dtype: str = "bf16"):
    """Scanned body of evaluate_scenes_batched_fusion (scan_chunk > 0): all
    per-step inputs are packed host-side into (T, B, ...) index/pose arrays
    once, the unique images + feature bank live on device, and the lockstep
    recurrence advances ``scan_chunk`` steps per dispatch with the state
    threaded through jax.lax.scan chunks."""
    import time

    import jax
    import jax.numpy as jnp

    assert mesh is None, "scan_chunk is single-device (use per-step " \
                         "dispatch for mesh-sharded bulk eval)"
    B = len(jobs)
    V = cfg.n_measurement_frames
    t0 = time.perf_counter()

    # flat (unique scene, name) image array on device + one-dispatch encode
    flat = [(uj, n) for uj in range(len(sdata)) for n in sdata[uj]["unique"]]
    bank_index = {key: gi for gi, key in enumerate(flat)}
    pad_u = -(-len(flat) // B) * B
    flat_p = flat + [flat[-1]] * (pad_u - len(flat))
    img_np = np.stack([sdata[uj]["assets"].image(n) for uj, n in flat_p])
    images = jnp.asarray(img_np)
    feats = engine._extract_scan(
        engine.variables, images.reshape((pad_u // B, B) + img_np.shape[1:]))
    bdt = _bank_dtype(bank_dtype)
    bank = tuple(
        f.reshape((pad_u,) + f.shape[2:]).astype(bdt) for f in feats)

    max_steps = max(len(sdata[u]["steps"]) for u in live)
    schedule = _scan_schedule(max_steps, scan_chunk)
    T_pad = sum(schedule)
    ref_idx = np.zeros((T_pad, B), np.int32)
    meas_idx = np.zeros((T_pad, B, V), np.int32)
    view_mask = np.zeros((T_pad, B, V), np.float32)
    ref_pose = np.zeros((T_pad, B, 4, 4), np.float32)
    meas_pose = np.zeros((T_pad, B, V, 4, 4), np.float32)
    keep = np.ones((T_pad, B), np.float32)
    for t in range(T_pad):
        for si in range(B):
            u = eff_of[si]
            s = sdata[u]
            a = s["assets"]
            # steps past a scene's end replay its last entry (keep=1):
            # well-formed compute whose outputs are dropped below
            reset, ref, ms = s["steps"][min(t, len(s["steps"]) - 1)]
            if t < len(s["steps"]) and reset:
                keep[t, si] = 0.0
            names = list(ms)[:V]
            view_mask[t, si, :len(names)] = 1.0
            names = names + [names[0]] * (V - len(names))
            ref_idx[t, si] = bank_index[(u, ref)]
            meas_idx[t, si] = [bank_index[(u, n)] for n in names]
            ref_pose[t, si] = a.pose(ref)
            meas_pose[t, si] = [a.pose(n) for n in names]
    K_b = jnp.asarray(np.stack(
        [sdata[eff_of[si]]["assets"].updated_K for si in range(B)]))

    results = [
        ([], [] if sdata[scene_of[si]]["assets"].depth_filenames is not None
         else None)
        for si in range(B)]
    state = engine.init_batch_state(B)
    n_predicted = 0
    c = 0
    for step in schedule:
        xs = dict(
            ref_idx=jnp.asarray(ref_idx[c:c + step]),
            meas_idx=jnp.asarray(meas_idx[c:c + step]),
            view_mask=jnp.asarray(view_mask[c:c + step]),
            ref_pose=jnp.asarray(ref_pose[c:c + step]),
            meas_pose=jnp.asarray(meas_pose[c:c + step]),
            keep=jnp.asarray(keep[c:c + step]))
        state, out = engine._fusion_scan(
            engine.variables, bank, images, K_b, state, xs)
        depth = np.asarray(out)
        for dt_i in range(depth.shape[0]):
            t = c + dt_i
            for si in range(B):
                own = sdata[scene_of[si]]
                if t >= len(own["steps"]):
                    continue
                results[si][0].append(depth[dt_i, si])
                n_predicted += 1
                if results[si][1] is not None:
                    _, ref, _ = own["steps"][t]
                    results[si][1].append(own["assets"].gt_depth(ref))
        c += step

    dt = time.perf_counter() - t0
    print(f"scene-batched eval: {n_predicted} keyframes over {B} scenes in "
          f"{dt:.2f}s ({n_predicted / dt:.1f} images/s, scan {scan_chunk})")
    return results


def main():
    from dvmvs_tpu.utils.jax_setup import setup_jax

    setup_jax()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", choices=["pairnet", "fusionnet"], default="fusionnet")
    ap.add_argument("--data", required=True, help="folder with indices/ and <dataset>/<scene>/")
    ap.add_argument("--dataset-name", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output", default="results")
    ap.add_argument("--n-measurement-frames", type=int, default=2)
    ap.add_argument("--no-evaluate", action="store_true")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None,
                    help="pairnet throughput mode: B independent keyframes "
                         "per dispatch (stateless, so the batch axis is "
                         "free TPU parallelism)")
    ap.add_argument("--n-devices", type=int, default=None,
                    help="with --batch-size/--scene-batch: shard the batch "
                         "over this many devices (multi-chip bulk eval)")
    ap.add_argument("--scene-batch", type=int, default=None,
                    help="fusionnet throughput mode: advance this many "
                         "scenes in lockstep, one batched recurrent step "
                         "per dispatch (scenes are the parallel axis of "
                         "the recurrent model)")
    ap.add_argument("--scan-chunk", type=int, default=0,
                    help="with --batch-size/--scene-batch: fold this many "
                         "batches/steps into one dispatch via lax.scan "
                         "(device-resident image+feature bank; removes the "
                         "per-dispatch host round-trip; single-device only)")
    ap.add_argument("--bank-dtype", choices=["bf16", "f32"], default="bf16",
                    help="storage dtype of the device-resident feature "
                         "banks in the batched/scanned throughput modes "
                         "(bf16 halves HBM residency — ~0.5 GB/scene at "
                         "320x256 — and is cast to f32 at consumption; "
                         "parity vs f32 banks pinned in "
                         "tests/test_drivers_e2e.py)")
    ap.add_argument("--width", type=int, default=None,
                    help="test image width (default: config default)")
    ap.add_argument("--height", type=int, default=None,
                    help="test image height (default: config default)")
    ap.add_argument("--visualize", action="store_true",
                    help="live cv2 windows (or PNG panels when headless)")
    args = ap.parse_args()

    size_kw = {}
    for flag, key in ((args.width, "image_width"), (args.height, "image_height")):
        if flag is not None:
            if flag % 32:
                raise SystemExit(f"--{key.split('_')[1]} must be a multiple "
                                 "of 32 (1/32 bottleneck grid)")
            size_kw[key] = flag
    cfg = TestConfig(n_measurement_frames=args.n_measurement_frames,
                     visualize=args.visualize, **size_kw)
    mesh = None
    if args.batch_size is not None and args.model != "pairnet":
        raise SystemExit("--batch-size requires --model pairnet "
                         "(fusionnet is recurrent within a scene; use "
                         "--scene-batch)")
    if args.scene_batch is not None and args.model != "fusionnet":
        raise SystemExit("--scene-batch applies to --model fusionnet")
    group = args.batch_size or args.scene_batch
    if group is not None and args.n_devices is not None and args.n_devices > 1:
        from dvmvs_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.n_devices)
        if group % args.n_devices:
            raise SystemExit("batch must divide by --n-devices")

    engine = InferenceEngine(args.model, cfg)
    if args.checkpoint:
        from dvmvs_tpu.utils.checkpoint import load_checkpoint
        engine.variables = load_checkpoint(args.checkpoint, engine.variables)

    indices_dir = os.path.join(args.data, "indices")
    index_files = sorted(
        os.path.join(indices_dir, f)
        for f in os.listdir(indices_dir)
        if (args.dataset_name is None or args.dataset_name in f)
        and f.endswith(f"nmeas+{args.n_measurement_frames}")
    )
    print(f"{len(index_files)} index files")

    def parse_job(index_file):
        keyframing_type, dataset_name, scene_name, _, _ = \
            os.path.basename(index_file).split("+")
        scene_folder = os.path.join(args.data, dataset_name, scene_name)
        system_name = (
            f"{keyframing_type}_{dataset_name}_{cfg.image_width}"
            f"_{cfg.image_height}_{args.n_measurement_frames}"
            f"_dvmvs_tpu_{args.model}"
        )
        return scene_folder, scene_name, system_name

    if args.scene_batch is not None:
        SB = args.scene_batch
        for s in range(0, len(index_files), SB):
            group_files = index_files[s:s + SB]
            n_real = len(group_files)
            group_files = group_files + [group_files[-1]] * (SB - n_real)
            jobs = [(parse_job(f)[0], f) for f in group_files]
            print(f"Predicting scenes {s}..{s + n_real - 1} of "
                  f"{len(index_files)} (lockstep batch {SB})")
            results = evaluate_scenes_batched_fusion(
                engine, jobs, cfg, mesh=mesh,
                evaluate=not args.no_evaluate, max_frames=args.max_frames,
                scan_chunk=args.scan_chunk, bank_dtype=args.bank_dtype)
            for f, (predictions, gts) in list(zip(group_files, results))[:n_real]:
                _, scene_name, system_name = parse_job(f)
                save_results(predictions, gts, system_name, scene_name,
                             args.output)
        return

    for i, index_file in enumerate(index_files):
        scene_folder, scene_name, system_name = parse_job(index_file)
        print(f"Predicting for scene {scene_name} - {i}/{len(index_files)}")
        if args.batch_size is not None:
            predictions, gts = evaluate_scene_batched(
                engine, scene_folder, index_file, cfg, args.batch_size,
                mesh=mesh, evaluate=not args.no_evaluate,
                max_frames=args.max_frames, scan_chunk=args.scan_chunk,
                bank_dtype=args.bank_dtype)
        else:
            predictions, gts = evaluate_scene(
                engine, scene_folder, index_file, cfg,
                evaluate=not args.no_evaluate, max_frames=args.max_frames)
        save_results(predictions, gts, system_name, scene_name, args.output)


if __name__ == "__main__":
    main()
