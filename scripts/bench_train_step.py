"""Measure the training step at the REFERENCE hyperparameters on one chip.

The reference trains fusionnet at batch 4, subsequence 8, 256x256
(/root/reference/dvmvs/fusionnet/run-training.py:19-20) and pairnet at
batch 14 (pairnet/run-training.py:19-21). This script builds the real
sharded train step (parallel/train.py, full unfreeze = last stage), feeds
it distinct per-step batches with LIVE keyframe-spaced SE(3) poses (so the
cost-volume tier switch does runtime work, like real training), and reports
ms/step + peak HBM, optionally A/B-ing the differentiable cost-volume
method (pallas-VJP ladder vs XLA banded ladder vs gather).

Timing: per-dispatch wall time around a loss readback, minus the sandbox's
fixed ~34 ms relay RTT; min over steps after warm-up (the relay TPU is
shared, docs/PERF.md).

Usage:
  python scripts/bench_train_step.py --model fusionnet -B 4 -S 8 --res 256
  python scripts/bench_train_step.py --model pairnet -B 14 --res 256
  python scripts/bench_train_step.py ... --method xla_banded   (A/B)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RELAY_RTT_S = 0.034


def subsequence_poses(rs, B, S, t_step=0.17, rot_deg=5.0):
    """(B, S, 4, 4) c2w walks spaced like training pairs (the crawler's
    pose-distance window is [0.125, 0.325], dvmvs/dataset_loader.py:112)."""
    out = np.empty((B, S, 4, 4), np.float32)
    for b in range(B):
        pose = np.eye(4)
        for s in range(S):
            out[b, s] = pose
            axis = rs.randn(3)
            axis /= np.linalg.norm(axis)
            ang = np.deg2rad(rot_deg * rs.uniform(0.5, 1.5))
            Kx = np.array([[0, -axis[2], axis[1]],
                           [axis[2], 0, -axis[0]],
                           [-axis[1], axis[0], 0]])
            R = np.eye(3) + np.sin(ang) * Kx + (1 - np.cos(ang)) * (Kx @ Kx)
            step = np.eye(4)
            step[:3, :3] = R
            d = rs.randn(3)
            step[:3, 3] = d / np.linalg.norm(d) * t_step * rs.uniform(0.8, 1.2)
            pose = pose @ step
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", choices=["pairnet", "fusionnet"],
                    default="fusionnet")
    ap.add_argument("-B", "--batch-size", type=int, default=4)
    ap.add_argument("-S", "--subsequence-length", type=int, default=8)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--method", default="auto",
                    choices=["auto", "xla_banded", "gather"])
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    from dvmvs_tpu.ops import cost_volume as cv_mod
    cv_mod.TRAIN_CV_METHOD = args.method

    import jax
    import jax.numpy as jnp

    from dvmvs_tpu.utils.jax_setup import setup_jax

    setup_jax()

    from dvmvs_tpu.apps.run_training import init_variables
    from dvmvs_tpu.config import TrainConfig
    from dvmvs_tpu.models.fusionnet import FusionNet
    from dvmvs_tpu.models.pairnet import PairNet
    from dvmvs_tpu.parallel.train import (
        FUSIONNET_STAGES,
        PAIRNET_STAGES,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    kind = args.model
    B, S, R = args.batch_size, args.subsequence_length, args.res
    if kind == "pairnet":
        S = 2
    cfg = TrainConfig(subsequence_length=S, batch_size=B,
                     image_width=R, image_height=R)

    model = FusionNet() if kind == "fusionnet" else PairNet()
    variables = init_variables(model, kind, cfg)
    stages = FUSIONNET_STAGES if kind == "fusionnet" else PAIRNET_STAGES
    tx = make_optimizer(variables["params"], stages[-1], cfg.learning_rate)
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, kind=kind,
                              two_way=(kind == "pairnet"))

    rs = np.random.RandomState(0)
    K = np.tile(np.array([[0.8 * R, 0, R / 2], [0, 0.8 * R, R / 2],
                          [0, 0, 1]], np.float32), (B, 1, 1))

    def batch_at(i):
        rs_i = np.random.RandomState(1000 + i)
        return {
            "images": jnp.asarray(
                rs_i.randn(B, S, R, R, 3).astype(np.float32)),
            "depths": jnp.asarray(
                (1.0 + 4.0 * rs_i.rand(B, S, R, R)).astype(np.float32)),
            "poses": jnp.asarray(subsequence_poses(rs_i, B, S)),
            "K": jnp.asarray(K),
        }

    rng = jax.random.PRNGKey(0)
    print(f"{kind} B={B} S={S} {R}x{R} method={args.method}: compiling...",
          flush=True)
    t0 = time.time()
    state, m = step_fn(state, batch_at(0), rng)
    loss0 = float(m["loss"])
    print(f"  compile+first step {time.time() - t0:.1f}s loss={loss0:.3f}",
          flush=True)

    times = []
    for i in range(1, args.warmup + args.steps):
        b = batch_at(i)
        t0 = time.perf_counter()
        state, m = step_fn(state, b, rng)
        _ = float(m["loss"])  # host readback forces completion
        times.append(time.perf_counter() - t0)
    times = times[args.warmup - 1:]
    best = min(times) - RELAY_RTT_S
    med = float(np.median(times)) - RELAY_RTT_S
    print(f"  ms/step: min {best * 1e3:.0f}  median {med * 1e3:.0f} "
          f"(over {len(times)} steps, relay RTT subtracted)")

    stats = jax.local_devices()[0].memory_stats()
    if stats:
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        lim = stats.get("bytes_limit", 0) / 2**30
        print(f"  peak HBM: {peak:.2f} GiB (limit {lim:.2f} GiB)")
    else:
        # relay backend exposes no live memory stats; report the compiled
        # program's accounting instead (same-process second lower() hits
        # the compilation cache)
        ma = step_fn.lower(state, batch_at(0), rng).compile().memory_analysis()
        if ma is not None:
            args = getattr(ma, "argument_size_in_bytes", 0)
            temp = getattr(ma, "temp_size_in_bytes", 0)
            out = getattr(ma, "output_size_in_bytes", 0)
            alias = getattr(ma, "alias_size_in_bytes", 0)
            total = args + temp + out - alias
            print(f"  compiled HBM: args {args / 2**30:.2f} + temp "
                  f"{temp / 2**30:.2f} + out {out / 2**30:.2f} - aliased "
                  f"{alias / 2**30:.2f} = {total / 2**30:.2f} GiB")


if __name__ == "__main__":
    main()
