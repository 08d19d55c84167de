"""Bulk evaluation of baseline depth estimators over keyframe index files
(reference: dvmvs/baselines/*/run-testing.py — one shared loop here instead
of four near-identical clones)."""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np

from dvmvs_tpu.baselines.registry import BASELINE_REGISTRY
import dvmvs_tpu.baselines.mvdepthnet  # noqa: F401  (registry population)
import dvmvs_tpu.baselines.gpmvs  # noqa: F401
import dvmvs_tpu.baselines.dpsnet  # noqa: F401
import dvmvs_tpu.baselines.deltas  # noqa: F401
from dvmvs_tpu.data.io import load_depth_png, load_image
from dvmvs_tpu.data.preprocess import PreprocessImage
from dvmvs_tpu.utils.results import InferenceTimer, save_results


def evaluate_scene_baseline(estimator, scene_folder: str, index_file: str,
                            evaluate: bool = True, max_frames: Optional[int] = None):
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
    preprocessor = None
    timer = InferenceTimer()
    estimator.reset()

    for line in lines:
        if max_frames is not None and len(predictions) >= max_frames:
            break
        if line == "TRACKING LOST":
            estimator.reset()
            continue
        names = line.split(" ")
        ref_name, meas_names = names[0], names[1:]
        ref_index = name_to_index[ref_name]

        raw = load_image(os.path.join(images_dir, ref_name))
        if preprocessor is None:
            preprocessor = PreprocessImage(
                K=K, old_width=raw.shape[1], old_height=raw.shape[0],
                new_width=estimator.image_width, new_height=estimator.image_height,
                distortion_crop=0, perform_crop=False)
        ref_image = preprocessor.apply_rgb(
            raw, estimator.scale_rgb, list(estimator.mean_rgb), list(estimator.std_rgb))
        updated_K = preprocessor.get_updated_intrinsics().astype(np.float32)

        if reference_depths is not None:
            d = load_depth_png(os.path.join(depth_dir, depth_filenames[ref_index]))
            reference_depths.append(preprocessor.apply_depth(d))

        meas_images, meas_poses = [], []
        for m in meas_names:
            img = preprocessor.apply_rgb(
                load_image(os.path.join(images_dir, m)),
                estimator.scale_rgb, list(estimator.mean_rgb), list(estimator.std_rgb))
            meas_images.append(img)
            meas_poses.append(poses[name_to_index[m]])

        timer.record_start_time()
        depth = estimator.predict(ref_image, meas_images, poses[ref_index],
                                  meas_poses, updated_K)
        timer.record_end_time_and_elapsed_time()
        predictions.append(depth)

    timer.print_statistics()
    return predictions, reference_depths


def main():
    from dvmvs_tpu.utils.jax_setup import setup_jax

    setup_jax()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--baseline", choices=["mvdepthnet", "gpmvs", "dpsnet", "deltas"], required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--dataset-name", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output", default="results")
    ap.add_argument("--n-measurement-frames", type=int, default=2)
    ap.add_argument("--no-evaluate", action="store_true")
    ap.add_argument("--max-frames", type=int, default=None)
    args = ap.parse_args()

    variables = None
    if args.checkpoint:
        from dvmvs_tpu.utils.checkpoint import load_checkpoint
        variables = load_checkpoint(args.checkpoint, None)
    estimator = BASELINE_REGISTRY[args.baseline](
        n_measurement_frames=args.n_measurement_frames, variables=variables)

    indices_dir = os.path.join(args.data, "indices")
    index_files = sorted(
        os.path.join(indices_dir, f) for f in os.listdir(indices_dir)
        if (args.dataset_name is None or args.dataset_name in f)
        and f.endswith(f"nmeas+{args.n_measurement_frames}"))
    for i, index_file in enumerate(index_files):
        keyframing_type, dataset_name, scene_name, _, _ = os.path.basename(index_file).split("+")
        scene_folder = os.path.join(args.data, dataset_name, scene_name)
        print(f"Predicting {dataset_name}-{scene_name} with {args.baseline} - {i}/{len(index_files)}")
        predictions, gts = evaluate_scene_baseline(
            estimator, scene_folder, index_file,
            evaluate=not args.no_evaluate, max_frames=args.max_frames)
        system_name = (
            f"{keyframing_type}_{dataset_name}_{estimator.image_width}_"
            f"{estimator.image_height}_{args.n_measurement_frames}_{args.baseline}")
        save_results(predictions, gts, system_name, scene_name, args.output)


if __name__ == "__main__":
    main()
