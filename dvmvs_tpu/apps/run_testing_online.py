"""Online single-scene evaluation: stream every frame through the keyframe
buffer, predict on accepted keyframes only
(reference: dvmvs/fusionnet/run-testing-online.py, pairnet variant).

The keyframe buffer stores, per accepted keyframe, the cached half-res
features (device) next to the pose — so the backbone runs once per keyframe
and measurement features are never recomputed.
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
    ap.add_argument("--visualize", action="store_true",
                    help="live cv2 windows (or PNG panels when headless)")
    args = ap.parse_args()

    cfg = TestConfig(n_measurement_frames=args.n_measurement_frames,
                     visualize=args.visualize)
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
    print("Predicting with System:", system_name)
    predictions, gts = predict_scene(
        engine, args.scene, cfg, evaluate=not args.no_evaluate, max_frames=args.max_frames)
    save_results(predictions, gts, system_name, scene_name, args.output)


if __name__ == "__main__":
    main()
