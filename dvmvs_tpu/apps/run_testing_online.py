"""Online single-scene evaluation: stream every frame through the keyframe
buffer, predict on accepted keyframes only
(reference: dvmvs/fusionnet/run-testing-online.py, pairnet variant).

The keyframe buffer stores, per accepted keyframe, the cached half-res
features (device) next to the pose — so the backbone runs once per keyframe
and measurement features are never recomputed.

``--live-tsdf`` additionally fuses every predicted depth into an on-device
TSDF volume inside the same streaming loop and writes the mesh at the end —
live 3D reconstruction, a capability beyond the reference (where
reconstruction is a separate offline pass over saved predictions,
sample-data/run-tsdf-reconstruction.py); practical here because the jitted
integrate step costs ~6.8 ms/frame at 1.26M voxels (docs/PERF.md).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import queue
import threading

from dvmvs_tpu.config import MEAN_RGB, SCALE_RGB, STD_RGB, TestConfig
from dvmvs_tpu.data.io import load_depth_png, load_image, load_scene
from dvmvs_tpu.data.preprocess import PreprocessImage
from dvmvs_tpu.apps.engine import InferenceEngine
from dvmvs_tpu.utils.keyframe_buffer import KeyframeBuffer
from dvmvs_tpu.utils.results import InferenceTimer, save_results


class LiveTSDF:
    """Streaming TSDF fusion of predicted depths during online inference.

    A live system cannot see the full trajectory in advance, so unless
    explicit ``bounds`` are given the volume is allocated on the first
    accepted keyframe as an axis-aligned cube of half-extent
    ``max_depth + 2 * voxel_size`` centered on that camera position —
    every surface the camera can observe from near the start lies inside.
    Frames that later wander outside simply stop contributing updates
    (out-of-volume voxels are never touched by the integrate step).
    """

    def __init__(self, voxel_size: float = 0.05, max_depth: float = 3.0,
                 bounds=None):
        self.voxel_size = float(voxel_size)
        self.max_depth = float(max_depth)
        self._bounds = None if bounds is None else np.asarray(bounds, float)
        self.volume = None
        self.n_integrated = 0

    def integrate(self, color_im: np.ndarray, depth: np.ndarray,
                  K: np.ndarray, pose: np.ndarray):
        """``color_im`` must already be geometry-aligned with ``depth``/``K``
        (same crop + resize — the driver reuses its PreprocessImage)."""
        from dvmvs_tpu.ops.tsdf import TSDFVolume

        if self.volume is None:
            if self._bounds is None:
                c = pose[:3, 3]
                r = self.max_depth + 2 * self.voxel_size
                self._bounds = np.stack([c - r, c + r], axis=1)
            self.volume = TSDFVolume(self._bounds, voxel_size=self.voxel_size)
        d = depth.copy()
        d[d > self.max_depth] = 0.0
        self.volume.integrate(
            np.clip(color_im, 0, 255).astype(np.uint8), d, K, pose)
        self.n_integrated += 1

    def save_mesh(self, path: str):
        from dvmvs_tpu.utils.native import write_mesh_ply

        if self.volume is None:
            print("live-tsdf: no frames integrated, no mesh written")
            return
        verts, faces, norms, colors = self.volume.get_mesh()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        write_mesh_ply(path, verts, faces, norms, colors)
        print(f"live-tsdf: {self.n_integrated} keyframes fused -> "
              f"{len(verts)} vertices / {len(faces)} faces -> {path}")


class _FramePrefetcher:
    """Sequential read-ahead of frame decode on a worker thread, so host
    image IO overlaps device compute (the reference loads synchronously per
    frame, run-testing-online.py:104)."""

    def __init__(self, filenames, depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._filenames = filenames
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        for f in self._filenames:
            self._q.put(load_image(f))
        self._q.put(None)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            yield item


def predict_scene(
    engine: InferenceEngine,
    scene_path: str,
    cfg: TestConfig,
    evaluate: bool = True,
    max_frames=None,
    live_tsdf: "LiveTSDF | None" = None,
):
    scene = load_scene(scene_path)
    buf = KeyframeBuffer(
        buffer_size=cfg.keyframe_buffer_size,
        keyframe_pose_distance=cfg.keyframe_pose_distance,
        optimal_t_score=cfg.optimal_t_measure,
        optimal_R_score=cfg.optimal_R_measure,
    )

    preprocessor = None
    predictions = []
    reference_depths = [] if (evaluate and scene.depth_filenames) else None
    timer = InferenceTimer()
    engine.reset()

    prefetcher = _FramePrefetcher(scene.image_filenames[: len(scene.poses)])
    for i, image_raw in enumerate(prefetcher):
        if max_frames is not None and len(predictions) >= max_frames:
            break
        pose = scene.poses[i]

        if preprocessor is None:
            preprocessor = PreprocessImage(
                K=scene.K,
                old_width=image_raw.shape[1],
                old_height=image_raw.shape[0],
                new_width=cfg.image_width,
                new_height=cfg.image_height,
                distortion_crop=cfg.distortion_crop,
                perform_crop=cfg.perform_crop,
            )

        # Keyframe entry: (pose, cached half-res features on device[, image])
        response = buf.try_new_keyframe(pose, None)
        if response == 0:
            image = preprocessor.apply_rgb(image_raw, SCALE_RGB, MEAN_RGB, STD_RGB)
            f_half = engine.encode(image)[0]
            buf.buffer[-1] = (pose, f_half, image if cfg.visualize else None)
            continue
        if response in (2, 4, 5):
            continue
        if response == 3:
            engine.reset()
            continue

        updated_K = preprocessor.get_updated_intrinsics().astype(np.float32)
        if reference_depths is not None:
            d = load_depth_png(scene.depth_filenames[i])
            reference_depths.append(preprocessor.apply_depth(d))

        image = preprocessor.apply_rgb(image_raw, SCALE_RGB, MEAN_RGB, STD_RGB)
        measurement_frames = buf.get_best_measurement_frames(cfg.n_measurement_frames)
        meas_half = [entry[1] for entry in measurement_frames]
        meas_poses = [entry[0] for entry in measurement_frames]

        timer.record_start_time()
        # fused encode+predict: one device dispatch; the reference frame's
        # half-res features come back for the keyframe cache
        depth, f_half = engine.encode_and_predict(
            image, meas_half, pose, meas_poses, updated_K)
        timer.record_end_time_and_elapsed_time()
        buf.buffer[-1] = (pose, f_half, image if cfg.visualize else None)
        predictions.append(depth)
        if live_tsdf is not None:
            color = preprocessor.apply_rgb(
                image_raw, 1.0, [0.0] * 3, [1.0] * 3, normalize_colors=False)
            live_tsdf.integrate(color, depth, updated_K, pose)

        if cfg.visualize:
            # reference Config.test_visualize (run-testing-online.py:216-221)
            from dvmvs_tpu.utils import visualization as viz

            meas_image = measurement_frames[0][2]
            if viz.display_available():
                viz.visualize_predictions(
                    image, meas_image, depth, MEAN_RGB, STD_RGB, SCALE_RGB)
            else:
                viz.save_visualization(
                    "visualizations", len(predictions) - 1, image, meas_image,
                    depth, MEAN_RGB, STD_RGB, SCALE_RGB)

    timer.print_statistics()
    return predictions, reference_depths


def main():
    from dvmvs_tpu.utils.jax_setup import setup_jax

    setup_jax()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", choices=["pairnet", "fusionnet"], default="fusionnet")
    ap.add_argument("--scene", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output", default="results")
    ap.add_argument("--n-measurement-frames", type=int, default=2)
    ap.add_argument("--no-evaluate", action="store_true")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--width", type=int, default=None,
                    help="test image width (default: config default)")
    ap.add_argument("--height", type=int, default=None,
                    help="test image height (default: config default)")
    ap.add_argument("--visualize", action="store_true",
                    help="live cv2 windows (or PNG panels when headless)")
    ap.add_argument("--live-tsdf", default=None, metavar="MESH.ply",
                    help="fuse predicted depths into an on-device TSDF "
                         "volume inside the streaming loop; write the "
                         "colored mesh here at the end")
    ap.add_argument("--tsdf-voxel-size", type=float, default=0.05)
    ap.add_argument("--tsdf-max-depth", type=float, default=3.0)
    ap.add_argument("--tsdf-bounds", type=float, nargs=6, default=None,
                    metavar=("X0", "X1", "Y0", "Y1", "Z0", "Z1"),
                    help="explicit volume bounds (default: cube of "
                         "half-extent max-depth around the first keyframe)")
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
    engine = InferenceEngine(args.model, cfg)
    if args.checkpoint:
        from dvmvs_tpu.utils.checkpoint import load_checkpoint
        engine.variables = load_checkpoint(args.checkpoint, engine.variables)

    dataset_name = os.path.basename(os.path.dirname(os.path.normpath(args.scene)))
    scene_name = os.path.basename(os.path.normpath(args.scene))
    system_name = (
        f"keyframe_{dataset_name}_{cfg.image_width}_{cfg.image_height}"
        f"_{args.n_measurement_frames}_dvmvs_tpu_{args.model}_online"
    )
    live_tsdf = None
    if args.live_tsdf:
        bounds = None
        if args.tsdf_bounds is not None:
            bounds = np.asarray(args.tsdf_bounds, float).reshape(3, 2)
        live_tsdf = LiveTSDF(voxel_size=args.tsdf_voxel_size,
                             max_depth=args.tsdf_max_depth, bounds=bounds)

    print("Predicting with System:", system_name)
    predictions, gts = predict_scene(
        engine, args.scene, cfg, evaluate=not args.no_evaluate,
        max_frames=args.max_frames, live_tsdf=live_tsdf)
    save_results(predictions, gts, system_name, scene_name, args.output)
    if live_tsdf is not None:
        live_tsdf.save_mesh(args.live_tsdf)


if __name__ == "__main__":
    main()
