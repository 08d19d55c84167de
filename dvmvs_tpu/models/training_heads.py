"""Training-mode forward passes.

  - FusionNet BPTT over a length-S subsequence as `nn.scan` with the
    (h, c) carry and carried batch_stats — the TPU-idiomatic form of the
    reference's Python step loop (fusionnet/run-training.py:227-267).
    The hidden-state warp uses GT depth nearest-downsampled x1/32
    (run-training.py:249-253).
  - PairNet pair training with optional two-way prediction and
    post-cost-volume horizontal flip augmentation
    (pairnet/run-training.py:204-246).

These are module *methods* (invoked via ``model.apply(..., method=...)``)
so training and inference share one parameter tree.

Deviation from the reference (documented): image features for all S frames
are extracted in one batched backbone pass (B*S images) rather than S
separate passes — identical math, but train-mode BatchNorm batch statistics
in the extractor are computed over B*S instead of B. Running stats converge
to the same place; throughput on the MXU is far better.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dvmvs_tpu.models.convlstm import warp_hidden_state
from dvmvs_tpu.models.pairnet import scale_intrinsics
from dvmvs_tpu.ops.cost_volume import plane_sweep_cost_volume_train
from dvmvs_tpu.ops.sampling import resize_nearest


def fusionnet_train_sequence(self, images, depths, poses, K, bn_train: bool = True):
    """BPTT forward. images (B,S,H,W,3), depths (B,S,H,W), poses (B,S,4,4),
    K (B,3,3) full-res. Returns 5 stacked prediction scales, each
    (S-1, B, h, w), for frames 1..S-1."""
    B, S, H, W, _ = images.shape
    feats = self.extract_features(images.reshape(B * S, H, W, 3), train=bn_train)
    f_half, f_quarter, f_one_eight, f_one_sixteen = (
        f.reshape((B, S) + f.shape[1:]) for f in feats
    )
    half_K = scale_intrinsics(K, 0.5)
    lstm_K = scale_intrinsics(K, 1.0 / 32.0)
    hyps = resize_nearest(depths.reshape(B * S, H, W), H // 32, W // 32)
    hyps = hyps.reshape(B, S, H // 32, W // 32)

    def time_major(x):
        return jnp.swapaxes(x, 0, 1)

    xs = {
        "ref_half": time_major(f_half[:, 1:]),
        "meas_half": time_major(f_half[:, :-1]),
        "ref_quarter": time_major(f_quarter[:, 1:]),
        "ref_one_eight": time_major(f_one_eight[:, 1:]),
        "ref_one_sixteen": time_major(f_one_sixteen[:, 1:]),
        "image": time_major(images[:, 1:]),
        "pose": time_major(poses[:, 1:]),
        "prev_pose": time_major(poses[:, :-1]),
        "hyp": time_major(hyps[:, 1:]),
    }

    def body(mdl, carry, x):
        h, c = carry
        cv = plane_sweep_cost_volume_train(
            x["ref_half"], x["meas_half"], x["pose"], x["prev_pose"], half_K,
            mdl.min_depth, mdl.max_depth, mdl.n_depth_levels,
        )
        skip0, skip1, skip2, skip3, bottom = mdl.cost_volume_encoder(
            x["ref_half"], x["ref_quarter"], x["ref_one_eight"],
            x["ref_one_sixteen"], cv, bn_train)
        h_w = warp_hidden_state(h, x["prev_pose"], x["pose"], x["hyp"], lstm_K)
        h2, c2 = mdl.lstm_fusion(bottom, h_w, c)
        preds = mdl.cost_volume_decoder(
            x["image"], skip0, skip1, skip2, skip3, h2, bn_train)
        return (h2, c2), preds

    hidden = self.hidden_channels
    # Carry dtype must be a float independent of the wire format: callers
    # are expected to decode compact (uint8) batches first, but a uint8
    # carry0 would poison the scan's carry typing either way.
    carry_dtype = (images.dtype if jnp.issubdtype(images.dtype, jnp.floating)
                   else jnp.float32)
    carry0 = (
        jnp.zeros((B, H // 32, W // 32, hidden), carry_dtype),
        jnp.zeros((B, H // 32, W // 32, hidden), carry_dtype),
    )

    if self.is_initializing():
        # Materialize params/batch_stats of the scanned submodules before the
        # scan: lax.scan requires the carried collection to exist up front.
        _, preds0 = body(self, carry0, jax.tree.map(lambda x: x[0], xs))
        return jax.tree.map(lambda p: jnp.broadcast_to(p[None], (S - 1,) + p.shape), preds0)

    scan = nn.scan(
        body,
        variable_broadcast="params",
        variable_carry="batch_stats",
        split_rngs={"params": False},
        in_axes=0,
        out_axes=0,
    )
    _, preds = scan(self, carry0, xs)
    return preds  # tuple of 5, each (S-1, B, h, w)


def pairnet_train_pair(self, images, depths, poses, K, flip_mask,
                       two_way: bool = False, bn_train: bool = True):
    """Pair training forward. images (B,2,H,W,3); flip_mask: (n_dirs,)
    booleans (one per direction) — flips features/cost volume/image/GT along
    width after the cost volume, like the reference's feature-level
    augmentation. Returns list of (5-scale predictions, flipped GT) per
    direction."""
    B, S, H, W, _ = images.shape
    assert S == 2
    feats = self.extract_features(images.reshape(B * S, H, W, 3), train=bn_train)
    f_half, f_quarter, f_one_eight, f_one_sixteen = (
        f.reshape((B, S) + f.shape[1:]) for f in feats
    )
    half_K = scale_intrinsics(K, 0.5)

    directions = [(1, 0)] if not two_way else [(0, 1), (1, 0)]
    outputs = []
    for d, (i1, i2) in enumerate(directions):
        cv = plane_sweep_cost_volume_train(
            f_half[:, i1], f_half[:, i2], poses[:, i1], poses[:, i2], half_K,
            self.min_depth, self.max_depth, self.n_depth_levels,
        )
        flip = flip_mask[d]

        def maybe_flip(x, axis=2):
            return jnp.where(flip, jnp.flip(x, axis=axis), x)

        fh = maybe_flip(f_half[:, i1])
        fq = maybe_flip(f_quarter[:, i1])
        fe = maybe_flip(f_one_eight[:, i1])
        fs = maybe_flip(f_one_sixteen[:, i1])
        img = maybe_flip(images[:, i1])
        gt = maybe_flip(depths[:, i1])
        cv = maybe_flip(cv)

        skip0, skip1, skip2, skip3, bottom = self.cost_volume_encoder(
            fh, fq, fe, fs, cv, bn_train)
        preds = self.cost_volume_decoder(img, skip0, skip1, skip2, skip3, bottom, bn_train)
        outputs.append((preds, gt))
    return outputs
