"""Baseline depth estimators (comparison harness, reference: dvmvs/baselines/).

Each baseline is a plugin implementing the DepthEstimator protocol: it
consumes the same keyframe-index files, preprocessing, and result format as
the main system, so metrics are directly comparable
(reference: dvmvs/baselines/README.md).
"""

from dvmvs_tpu.baselines.registry import BASELINE_REGISTRY, DepthEstimator
