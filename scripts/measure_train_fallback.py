"""Measure the DIFFERENTIABLE cost-volume ladder's tier distribution on
realistic training geometry.

plane_sweep_cost_volume_train (ops/cost_volume.py) picks, PER BATCH
ELEMENT, the smallest band tier whose y-span check passes; past band-64 it
takes the dynamic-trip Pallas VJP pair ('dyn' below — before round 5 this
rung was the XLA gather fallback, which had no custom-VJP kernel, OOMed
without remat, and measured ~2x slower; docs/PERF.md). This script replays
the EXACT tier decision (same helpers: build_plane_matrices +
max_row_spans, x_tiles=1) at both granularities — per element (what the
ladder does now) and max-over-batch (what the pre-round-5 batch-level
switch did, kept to document the win) — over:

  1. one epoch of the proxy fusionnet training stream (B=4, S=8, 256^2,
     geometric-scale augmentation ON, the orchestrator's seeds) — decision
     per scan step, 7 per optimizer step;
  2. one epoch of the proxy pairnet stream (B=14, two directions per step,
     50% sequence reversal) — decision per direction;
  3. the real hololens keyframe trajectory replayed at train shapes
     (256^2, consecutive-keyframe pairs = the fusionnet training regime,
     keyframe->measurement pairs = the pairnet regime), both per-pair and
     batch-max decisions.

Runs entirely on CPU (the decision is a pure function of poses/K/H/W);
reference anchor for the loop this ladder replaces:
/root/reference/dvmvs/utils.py:65-84.

Usage:
  python scripts/measure_train_fallback.py [--root data_synth/train]
      [--seed 3] [--res 256] [--out docs/train_fallback.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from dvmvs_tpu.config import TrainConfig  # noqa: E402
from dvmvs_tpu.ops.cost_volume import inverse_depth_planes  # noqa: E402
from dvmvs_tpu.models.pairnet import scale_intrinsics  # noqa: E402
from dvmvs_tpu.ops.pallas.cost_volume_kernel import (  # noqa: E402
    BAND_TIERS,
    build_plane_matrices,
    max_row_spans,
)

HOLOLENS = os.path.join("/root", "reference", "sample-data")


def ladder_index(ref_poses, meas_poses, K, H, W, depth_cfg):
    """The EXACT decision of plane_sweep_cost_volume_train for one batch:
    smallest tier whose max-over-batch span fits, len(tiers) = gather.
    ref_poses/meas_poses (B,4,4), K (B,3,3) at FEATURE (half) resolution."""
    inv_depths = inverse_depth_planes(
        depth_cfg.min_depth, depth_cfg.max_depth, depth_cfg.n_depth_levels)
    Ms = jax.vmap(build_plane_matrices, in_axes=(0, 0, 0, None))(
        jnp.asarray(ref_poses), jnp.asarray(meas_poses), jnp.asarray(K),
        inv_depths)
    tiers = [b for b in BAND_TIERS if b <= H]
    spans = jax.vmap(
        lambda m: jnp.stack(max_row_spans(m, H, W, tuple(tiers))))(Ms)
    spans = np.asarray(spans)  # (B, n_tiers)
    idx = len(tiers)
    for i in range(len(tiers) - 1, -1, -1):
        if float(spans[..., i].max()) <= tiers[i]:
            idx = i
    # per-element decisions: what a per-sample (inside-the-map) switch
    # would pick for each batch element independently
    per_elem = np.full(spans.shape[0], len(tiers), np.int64)
    for i in range(len(tiers) - 1, -1, -1):
        per_elem = np.where(spans[:, i] <= tiers[i], i, per_elem)
    return idx, list(per_elem), [float(spans[..., i].max())
                                 for i in range(len(tiers))]


def tally(name, decisions, tiers):
    """Last-rung label is 'dyn': since the per-element ladder landed, the
    rung past the largest band tier is the dynamic-trip Pallas VJP pair —
    XLA gather is unreachable from method='auto' on TPU."""
    n = max(len(decisions), 1)
    hist = {f"band{b}": decisions.count(i) / n for i, b in enumerate(tiers)}
    hist["dyn"] = decisions.count(len(tiers)) / n
    print(f"{name}: n={len(decisions)} " + " ".join(
        f"{k}={v:.3f}" for k, v in hist.items() if v > 0))
    return {"n": len(decisions), "rates": hist}


def measure_proxy_stream(root, kind, seed, res, max_steps):
    """Replay the orchestrator's training stream batch-for-batch (same
    dataset seeding, same epoch-0 batch order seed = seed + epoch) and
    record every ladder decision the jitted step would make."""
    from dvmvs_tpu.data.dataset import MVSSequenceDataset, batch_iterator

    subseq = 8 if kind == "fusionnet" else 2
    batch = 4 if kind == "fusionnet" else 14
    cfg = TrainConfig(subsequence_length=subseq, batch_size=batch, seed=seed,
                      image_width=res, image_height=res,
                      data_pipeline_workers=1)
    ds = MVSSequenceDataset(root, "TRAINING", subseq, cfg,
                            geometric_scale_augmentation=True, seed=seed,
                            wire_compact=True)
    H = W = res // 2  # cost volume runs on half-res features
    decisions, elem_decisions, spans64 = [], [], []
    n = 0
    for b in batch_iterator(ds, batch, shuffle=True, seed=seed + 0):
        if n >= max_steps:
            break
        poses, K = b["poses"], b["K"]  # (B,S,4,4), (B,3,3)
        half_K = np.asarray(scale_intrinsics(jnp.asarray(K), 0.5))
        for t in range(1, poses.shape[1]):
            idx, elems, spans = ladder_index(
                poses[:, t], poses[:, t - 1], half_K, H, W, cfg.depth)
            decisions.append(idx)
            elem_decisions += elems
            spans64.append(spans[-1])
            if kind == "pairnet":  # two-way: the reverse direction too
                idx2, e2, s2 = ladder_index(
                    poses[:, t - 1], poses[:, t], half_K, H, W, cfg.depth)
                decisions.append(idx2)
                elem_decisions += e2
                spans64.append(s2[-1])
        n += 1
    tiers = [b_ for b_ in BAND_TIERS if b_ <= H]
    out = tally(f"proxy {kind} (seed {seed}, {n} steps)", decisions, tiers)
    out["per_element"] = tally(
        f"proxy {kind} per-element", elem_decisions, tiers)
    out["max_span_band64_check"] = max(spans64)
    return out


def measure_hololens(res):
    """Replay the shipped hololens keyframe trajectory at train shapes."""
    from dvmvs_tpu.data.preprocess import PreprocessImage

    scene = os.path.join(HOLOLENS, "hololens-dataset", "000")
    idx_file = os.path.join(HOLOLENS, "indices",
                            "keyframe+hololens-dataset+000+nmeas+2")
    K = np.loadtxt(os.path.join(scene, "K.txt")).astype(np.float32)
    poses = np.fromfile(os.path.join(scene, "poses.txt"),
                        dtype=float, sep="\n ").reshape(-1, 4, 4)
    names = sorted(f for f in os.listdir(os.path.join(scene, "images"))
                   if f.endswith(".png"))
    frame_of = {f: i for i, f in enumerate(names)}
    pre = PreprocessImage(K=K, old_width=540, old_height=360,
                          new_width=res, new_height=res)
    newK = pre.get_updated_intrinsics().astype(np.float32)
    half_K = np.asarray(scale_intrinsics(jnp.asarray(newK)[None], 0.5))[0]
    H = W = res // 2
    depth_cfg = TrainConfig().depth

    kf_pairs, meas_pairs = [], []
    prev_kf = None
    for line in open(idx_file):
        line = line.strip()
        if not line:
            continue
        if line == "TRACKING LOST":
            prev_kf = None
            continue
        fs = line.split(" ")
        kf = poses[frame_of[fs[0]]]
        if prev_kf is not None:
            kf_pairs.append((kf, prev_kf))
        prev_kf = kf
        for m in fs[1:]:
            meas_pairs.append((kf, poses[frame_of[m]]))

    tiers = [b for b in BAND_TIERS if b <= H]
    out = {}
    for label, pairs, B in (("consec-kf per-pair", kf_pairs, 1),
                            ("consec-kf B=4 batches", kf_pairs, 4),
                            ("kf->meas per-pair", meas_pairs, 1),
                            ("kf->meas B=14 batches", meas_pairs, 14)):
        decisions = []
        for s in range(0, len(pairs) - B + 1, B):
            grp = pairs[s:s + B]
            refs = np.stack([p[0] for p in grp])
            meas = np.stack([p[1] for p in grp])
            Ks = np.broadcast_to(half_K, (len(grp), 3, 3))
            idx, _, _ = ladder_index(refs, meas, Ks, H, W, depth_cfg)
            decisions.append(idx)
        out[label] = tally(f"hololens {label}", decisions, tiers)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="data_synth/train")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--max-steps", type=int, default=100)
    ap.add_argument("--out", default="docs/train_fallback.json")
    args = ap.parse_args()

    report = {"res": args.res, "seed": args.seed,
              "tiers": [b for b in BAND_TIERS if b <= args.res // 2]}
    report["fusionnet"] = measure_proxy_stream(
        args.root, "fusionnet", args.seed, args.res, min(args.max_steps, 32))
    report["pairnet"] = measure_proxy_stream(
        args.root, "pairnet", args.seed, args.res, args.max_steps)
    if os.path.isdir(HOLOLENS):
        report["hololens"] = measure_hololens(args.res)
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
