"""Benchmark: fusionnet online depth throughput at 320x256 on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: the per-step device time of the jitted recurrent prediction
step (features for ref+2 measurement views -> plane-sweep cost volume ->
encoder -> LSTM fusion -> decoder), amortized over a lax.scan of N steps in
a single dispatch with a forced host readback at the end. Amortization is
required because this sandbox reaches the TPU through an RPC relay with a
~34 ms fixed round-trip that (a) is not chip time and (b) reports
block_until_ready early; see .claude/skills/verify/SKILL.md.

Baseline: the reference system's poster reports ~25-35 FPS at 320x256 on an
unspecified GPU (BASELINE.md); vs_baseline is against 30 FPS.
"""

import json
import sys
import time

import numpy as np

BASELINE_FPS = 30.0
N_STEPS = 50
WARMUP_REPS = 2


def main():
    import jax
    import jax.numpy as jnp

    from dvmvs_tpu.utils.jax_setup import setup_jax

    setup_jax()

    from dvmvs_tpu.models.fusionnet import FusionNet

    from __graft_entry__ import _example_inputs

    model = FusionNet()
    args = _example_inputs()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    ref, meas, pose, mposes, K, carry, prev_pose, hyp = args

    # Distinct per-step frames so XLA cannot hoist the feature extraction
    # out of the scan, and the FULL recurrent state threaded through the
    # carry — including the previous depth map feeding the next step's
    # forward-splat hypothesis — so nothing is dead-code-eliminated. This is
    # exactly the online engine's per-frame device work.
    from dvmvs_tpu.models.pairnet import scale_intrinsics
    from dvmvs_tpu.ops.sampling import resize_nearest
    from dvmvs_tpu.ops.warp import splat_depth_max

    rs = np.random.RandomState(1)
    refs = jnp.asarray(rs.randn(N_STEPS, *ref.shape[1:]).astype(np.float32))
    meass = jnp.asarray(rs.randn(N_STEPS, *meas.shape[1:]).astype(np.float32))
    H, W = ref.shape[1:3]

    def many(variables, carry):
        prev_depth0 = jnp.zeros((1, H, W), jnp.float32)

        def body(state, x):
            c, prev_depth = state
            r, m = x
            half_K = scale_intrinsics(K, 0.5)
            splat = splat_depth_max(prev_depth, prev_pose, pose, K, half_K,
                                    H // 2, W // 2)
            hyp_t = resize_nearest(splat, H // 32, W // 32)
            depths, c2 = model.apply(
                variables, r[None], m[None], pose, mposes, K, c, prev_pose, hyp_t)
            return (c2, depths[0]), depths[0][0, 0, 0]
        _, outs = jax.lax.scan(body, (carry, prev_depth0), (refs, meass))
        return outs

    many_j = jax.jit(many)
    np.asarray(many_j(variables, carry))  # compile + warm
    times = []
    for _ in range(WARMUP_REPS + 3):
        t0 = time.perf_counter()
        np.asarray(many_j(variables, carry))  # readback forces completion
        times.append(time.perf_counter() - t0)
    dt = min(times[WARMUP_REPS:])
    per_step_ms = dt / N_STEPS * 1000.0
    fps = 1000.0 / per_step_ms

    print(json.dumps({
        "metric": "fusionnet_online_fps_320x256",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
