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


def evaluate_scene(
    engine: InferenceEngine,
    scene_folder: str,
    index_file: str,
    cfg: TestConfig,
    evaluate: bool = True,
    max_frames: Optional[int] = None,
):
    with open(index_file) as f:
        lines = [l for l in f.read().splitlines() if l]

    K = np.loadtxt(os.path.join(scene_folder, "K.txt")).astype(np.float32)
    poses = np.fromfile(os.path.join(scene_folder, "poses.txt"), dtype=float, sep="\n ").reshape(-1, 4, 4)
    images_dir = os.path.join(scene_folder, "images")
    image_filenames = sorted(f for f in os.listdir(images_dir) if f.endswith(".png"))
    name_to_index = {f: i for i, f in enumerate(image_filenames)}
    depth_dir = os.path.join(scene_folder, "depth")
    depth_filenames = (
        sorted(f for f in os.listdir(depth_dir) if f.endswith(".png"))
        if evaluate and os.path.isdir(depth_dir) else None
    )

    predictions = []
    reference_depths = [] if depth_filenames is not None else None
    feature_cache: Dict[str, object] = {}
    preprocessor = None
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
        ref_index = name_to_index[ref_name]

        ref_image_raw = load_image(os.path.join(images_dir, ref_name))
        if preprocessor is None:
            preprocessor = PreprocessImage(
                K=K,
                old_width=ref_image_raw.shape[1],
                old_height=ref_image_raw.shape[0],
                new_width=cfg.image_width,
                new_height=cfg.image_height,
                distortion_crop=cfg.distortion_crop,
                perform_crop=cfg.perform_crop,
            )
        ref_image = preprocessor.apply_rgb(ref_image_raw, SCALE_RGB, MEAN_RGB, STD_RGB)
        updated_K = preprocessor.get_updated_intrinsics().astype(np.float32)

        if reference_depths is not None:
            d = load_depth_png(os.path.join(depth_dir, depth_filenames[ref_index]))
            reference_depths.append(preprocessor.apply_depth(d))

        timer.record_start_time()
        ref_feats = engine.encode(ref_image)

        meas_half, meas_poses = [], []
        for m in meas_names:
            if m not in feature_cache:
                img = preprocessor.apply_rgb(
                    load_image(os.path.join(images_dir, m)), SCALE_RGB, MEAN_RGB, STD_RGB)
                feature_cache[m] = engine.encode(img)[0]  # keep f_half only
            meas_half.append(feature_cache[m])
            meas_poses.append(poses[name_to_index[m]])

        depth = engine.predict(
            ref_image, ref_feats, meas_half, poses[ref_index], meas_poses, updated_K)
        timer.record_end_time_and_elapsed_time()
        predictions.append(depth)

        if cfg.visualize:
            # reference Config.test_visualize (fusionnet/run-testing.py)
            from dvmvs_tpu.utils import visualization as viz

            meas_image = preprocessor.apply_rgb(
                load_image(os.path.join(images_dir, meas_names[0])),
                SCALE_RGB, MEAN_RGB, STD_RGB)
            if viz.display_available():
                viz.visualize_predictions(
                    ref_image, meas_image, depth, MEAN_RGB, STD_RGB, SCALE_RGB)
            else:
                viz.save_visualization(
                    "visualizations", len(predictions) - 1, ref_image,
                    meas_image, depth, MEAN_RGB, STD_RGB, SCALE_RGB)

    timer.print_statistics()
    return predictions, reference_depths


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
    ap.add_argument("--visualize", action="store_true",
                    help="live cv2 windows (or PNG panels when headless)")
    args = ap.parse_args()

    cfg = TestConfig(n_measurement_frames=args.n_measurement_frames,
                     visualize=args.visualize)

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

    for i, index_file in enumerate(index_files):
        keyframing_type, dataset_name, scene_name, _, nmeas = os.path.basename(index_file).split("+")
        scene_folder = os.path.join(args.data, dataset_name, scene_name)
        print(f"Predicting for scene {dataset_name}-{scene_name} - {i}/{len(index_files)}")
        predictions, gts = evaluate_scene(
            engine, scene_folder, index_file, cfg,
            evaluate=not args.no_evaluate, max_frames=args.max_frames)
        system_name = (
            f"{keyframing_type}_{dataset_name}_{cfg.image_width}_{cfg.image_height}"
            f"_{args.n_measurement_frames}_dvmvs_tpu_{args.model}"
        )
        save_results(predictions, gts, system_name, scene_name, args.output)


if __name__ == "__main__":
    main()
