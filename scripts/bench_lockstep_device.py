"""DEVICE-time throughput of the scanned bulk-serving programs (round-5
verdict task 4): the wall numbers in docs/serving_throughput*.json are
relay-tunnel-bound (~80% of wall is shipping depth maps through a ~15 MB/s
RPC tunnel), so the per-chip capability was previously EXTRAPOLATED from
the online step's breakdown. This measures it directly: T lockstep steps
of ``engine._fusion_scan`` / ``engine._predict_pair_scan`` (the REAL
driver programs, distinct per-step inputs — indices, poses, masks all vary
per step so nothing constant-folds) wrapped in a jit whose output is an
on-device reduction; timing = host readback of that scalar, so D2H is one
float, not T*B depth maps. RTT is measured with a null program and
subtracted; device ms/keyframe = (t_scan(T) - RTT) / (T * B).

Usage: python scripts/bench_lockstep_device.py [--json docs/lockstep_device.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from dvmvs_tpu.config import TestConfig
from dvmvs_tpu.apps.engine import InferenceEngine


def se3_walk(rng, n, t_step=0.06, rot_step_deg=2.0):
    """Mixed SE(3) random walk (same character as bench.py's mixed walk)."""
    from scipy.spatial.transform import Rotation

    poses = [np.eye(4, dtype=np.float32)]
    for _ in range(n - 1):
        d = np.eye(4, dtype=np.float32)
        d[:3, :3] = Rotation.from_euler(
            "xyz", rng.randn(3) * rot_step_deg, degrees=True).as_matrix()
        d[:3, 3] = rng.randn(3) * t_step
        poses.append((poses[-1] @ d).astype(np.float32))
    return np.stack(poses)


def time_readback(fn, *args, reps=5):
    out = fn(*args)
    float(np.asarray(out))  # warm-up + compile
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out))  # force full host readback through the relay
        best = min(best, time.perf_counter() - t0)
    return best


def bench_kind(kind, B, T, cfg, bank_dtype, rng):
    engine = InferenceEngine(kind, cfg)
    H, W, V = cfg.image_height, cfg.image_width, cfg.n_measurement_frames
    U = 24  # unique bank frames per scene (a ~30-frame reuse window)

    imgs = rng.randn(B * U, H, W, 3).astype(np.float32)
    images = jnp.asarray(imgs)
    feats = engine._extract_scan(
        engine.variables, images.reshape((B * U // B, B) + imgs.shape[1:]))
    bank = tuple(
        f.reshape((B * U,) + f.shape[2:]).astype(bank_dtype) for f in feats)

    walks = np.stack([se3_walk(rng, U) for _ in range(B)])  # (B, U, 4, 4)
    ref_idx = np.zeros((T, B), np.int32)
    meas_idx = np.zeros((T, B, V), np.int32)
    ref_pose = np.zeros((T, B, 4, 4), np.float32)
    meas_pose = np.zeros((T, B, V, 4, 4), np.float32)
    for t in range(T):
        for b in range(B):
            i = t % U
            ref_idx[t, b] = b * U + i
            ref_pose[t, b] = walks[b, i]
            for v in range(V):
                j = (i - 1 - v) % U
                meas_idx[t, b, v] = b * U + j
                meas_pose[t, b, v] = walks[b, j]
    xs = dict(ref_idx=jnp.asarray(ref_idx), meas_idx=jnp.asarray(meas_idx),
              view_mask=jnp.ones((T, B, V), jnp.float32),
              ref_pose=jnp.asarray(ref_pose),
              meas_pose=jnp.asarray(meas_pose))
    K = jnp.asarray(np.tile(np.array(
        [[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]],
        np.float32)[None], (B, 1, 1)))

    if kind == "fusionnet":
        xs["keep"] = jnp.ones((T, B), jnp.float32)
        state = engine.init_batch_state(B)

        @jax.jit
        def run(variables, bank, images, K, state, xs):
            _, depth = engine._fusion_scan_impl(
                variables, bank, images, K, state, xs)
            return jnp.mean(depth)

        t = time_readback(run, engine.variables, bank, images, K, state, xs)
    else:
        @jax.jit
        def run(variables, bank, images, K, xs):
            return jnp.mean(engine._predict_pair_scan_impl(
                variables, bank, images, K, xs))

        t = time_readback(run, engine.variables, bank, images, K, xs)
    return t


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", default="docs/lockstep_device.json")
    ap.add_argument("--T", type=int, default=32)
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[4, 16])
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    args = ap.parse_args()

    size_kw = {}
    if args.width:
        size_kw["image_width"] = args.width
    if args.height:
        size_kw["image_height"] = args.height
    cfg = TestConfig(**size_kw)  # default 320x256 nmeas 2 — reference shape
    rng = np.random.RandomState(0)

    # relay RTT floor: a null readback
    null = jax.jit(lambda x: x + 1.0)
    rtt = time_readback(null, jnp.zeros(()))
    print(f"relay RTT floor: {rtt * 1e3:.1f} ms")

    out = {"rtt_ms": rtt * 1e3, "T": args.T, "points": []}
    for kind in ("fusionnet", "pairnet"):
        for B in args.batch_sizes:
            for dt_name, bdt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
                t = bench_kind(kind, B, args.T, cfg, bdt, rng)
                per_kf_ms = (t - rtt) / (args.T * B) * 1e3
                kfs = 1e3 / per_kf_ms
                print(f"{kind} B={B} bank={dt_name}: scan({args.T}) "
                      f"{t * 1e3:.1f} ms -> {per_kf_ms:.2f} ms/kf device "
                      f"= {kfs:.0f} kf/s/chip")
                out["points"].append(dict(
                    kind=kind, B=B, bank=dt_name,
                    scan_ms=t * 1e3, per_kf_ms=per_kf_ms, kf_per_s=kfs))
    if args.json:
        with open(os.path.join(REPO, args.json), "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
