"""Inference engine: the device-side step functions for the drivers.

The reference drivers run 5 torch modules plus geometry from per-frame
Python (fusionnet/run-testing-online.py:158-211). Here the device work is
two jitted functions with static shapes:

  - ``encode``: MnasNet+FPN features for one frame. Called once per
    ACCEPTED keyframe; the half-res features are cached alongside the
    keyframe buffer entry, so measurement features are never recomputed
    (the reference re-runs the backbone on every measurement frame each
    step).
  - ``predict``: cost volume -> encoder [-> LSTM] -> decoder. Fusionnet's
    depth hypothesis (forward splat of the previous prediction + nearest
    x1/16) is computed inside the same jit — the previous depth stays on
    device between frames; there is no per-frame host round-trip
    (the reference bounces through np.unique on CPU, utils.py:148).

Measurement views are padded to ``n_measurement_frames`` with a validity
mask so one compiled program serves every keyframe cardinality.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from dvmvs_tpu.config import TestConfig
from dvmvs_tpu.models.fusionnet import FusionNet, LSTMCarry, init_lstm_carry
from dvmvs_tpu.models.pairnet import PairNet, scale_intrinsics
from dvmvs_tpu.ops.warp import splat_depth_max_strided


class InferenceEngine:
    def __init__(
        self,
        model_kind: str,
        cfg: TestConfig = TestConfig(),
        variables=None,
        seed: int = 0,
    ):
        assert model_kind in ("pairnet", "fusionnet")
        self.kind = model_kind
        self.cfg = cfg
        self.H, self.W = cfg.image_height, cfg.image_width
        self.V = cfg.n_measurement_frames

        if model_kind == "pairnet":
            self.model = PairNet(cfg.depth.min_depth, cfg.depth.max_depth, cfg.depth.n_depth_levels)
        else:
            self.model = FusionNet(cfg.depth.min_depth, cfg.depth.max_depth, cfg.depth.n_depth_levels)

        self._extract = jax.jit(
            lambda v, img: self.model.apply(v, img, method="extract_features")
        )

        if variables is None:
            variables = self._init_variables(seed)
        self.variables = variables

        self._predict_pair = jax.jit(self._predict_pair_impl)
        self._predict_fusion = jax.jit(self._predict_fusion_impl)
        self._fusion_step_batch = jax.jit(self._fusion_step_batch_impl)
        self._encode_predict = jax.jit(self._encode_predict_impl)
        self._extract_scan = jax.jit(self._extract_scan_impl)
        self._predict_pair_scan = jax.jit(self._predict_pair_scan_impl)
        self._fusion_scan = jax.jit(self._fusion_scan_impl)
        self.reset()

    # ------------------------------------------------------------------ init
    def _init_variables(self, seed: int):
        H, W = self.H, self.W
        dummy = jnp.zeros((1, H, W, 3), jnp.float32)
        return jax.jit(self.model.init, static_argnames=())(
            jax.random.PRNGKey(seed), *self._dummy_call_args(dummy)
        )

    def _dummy_call_args(self, ref):
        H, W, V = self.H, self.W, self.V
        meas = jnp.zeros((1, V, H, W, 3), jnp.float32)
        pose = jnp.eye(4, dtype=jnp.float32)[None]
        mposes = jnp.tile(pose[:, None], (1, V, 1, 1))
        K = jnp.asarray(np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)[None])
        if self.kind == "pairnet":
            return (ref, meas, pose, mposes, K)
        carry = init_lstm_carry(1, H, W)
        hyp = jnp.zeros((1, H // 32, W // 32), jnp.float32)
        return (ref, meas, pose, mposes, K, carry, pose, hyp)

    # ------------------------------------------------------------- jit impls
    def _predict_pair_impl(self, variables, ref_image, ref_feats, meas_half,
                           ref_pose, meas_poses, K, view_mask):
        return self.model.apply(
            variables, ref_image, ref_feats, meas_half, ref_pose, meas_poses,
            K, view_mask, method="predict_depth",
        )

    def _predict_fusion_impl(self, variables, ref_image, ref_feats, meas_half,
                             ref_pose, meas_poses, K, view_mask,
                             carry, prev_pose, prev_depth, has_prev):
        H, W = self.H, self.W
        half_K = scale_intrinsics(K, 0.5)
        # Bit-exact fusion of the half-res splat + nearest x1/16 downsample
        # (only stride-16 sites of the half-res grid survive the resize).
        splat = splat_depth_max_strided(
            prev_depth, prev_pose, ref_pose, K, half_K, H // 32, W // 32, 16)
        hyp = splat * has_prev
        depths, carry = self.model.apply(
            variables, ref_image, ref_feats, meas_half, ref_pose, meas_poses,
            K, carry, prev_pose, hyp, view_mask, method="predict_depth",
        )
        return depths, carry, depths[0]

    def _fusion_step_batch_impl(self, variables, ref_image, ref_feats,
                                meas_half, ref_pose, meas_poses, K,
                                view_mask, carry, prev_pose, prev_depth,
                                has_prev, keep):
        """One lockstep fusionnet step over B INDEPENDENT scenes
        (scene-parallel bulk eval): per-scene recurrent state with a
        per-scene ``keep`` mask (0 = tracking lost / scene start resets the
        carry, matching the sequential driver's engine.reset())."""
        H, W = self.H, self.W
        k4 = keep.reshape(-1, 1, 1, 1)
        carry = LSTMCarry(carry.h * k4, carry.c * k4)
        prev_depth = prev_depth * keep.reshape(-1, 1, 1)
        has_prev = has_prev * keep
        half_K = scale_intrinsics(K, 0.5)
        splat = splat_depth_max_strided(
            prev_depth, prev_pose, ref_pose, K, half_K, H // 32, W // 32, 16)
        hyp = splat * has_prev.reshape(-1, 1, 1)
        depths, carry = self.model.apply(
            variables, ref_image, ref_feats, meas_half, ref_pose, meas_poses,
            K, carry, prev_pose, hyp, view_mask, method="predict_depth",
        )
        return depths[0], carry, depths[0]

    def fusion_step_batch(self, ref_images, ref_feats, meas_half, ref_poses,
                          meas_poses, K, view_mask, state, keep):
        """Functional batched fusionnet step for scene-parallel bulk eval.
        ``state`` = (carry, prev_pose (B,4,4), prev_depth (B,H,W),
        has_prev (B,)); ``keep`` (B,) zeroes a scene's recurrent state
        before the step. Returns (full-res depth (B,H,W), new state)."""
        assert self.kind == "fusionnet"
        carry, prev_pose, prev_depth, has_prev = state
        depth, carry, full = self._fusion_step_batch(
            self.variables, ref_images, ref_feats, meas_half, ref_poses,
            meas_poses, K, view_mask, carry, prev_pose, prev_depth,
            has_prev, keep)
        new_state = (carry, ref_poses, full,
                     jnp.ones_like(has_prev))
        return depth, new_state

    def init_batch_state(self, batch: int):
        """Zero recurrent state for ``batch`` independent scenes."""
        return (init_lstm_carry(batch, self.H, self.W),
                jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (batch, 1, 1)),
                jnp.zeros((batch, self.H, self.W), jnp.float32),
                jnp.zeros((batch,), jnp.float32))

    # ------------------------------------------------- scanned bulk serving
    # The per-batch bulk paths above dispatch one compiled program per
    # keyframe batch (or per lockstep step) from Python — each dispatch pays
    # a fixed host round-trip that dominates wall time at small B (the
    # reference pays it per keyframe, fusionnet/run-testing.py:95-160).
    # These variants fold T consecutive batches into ONE dispatch with
    # jax.lax.scan over device-resident inputs: the unique-image array and
    # the encoded feature bank stay on device and every step gathers its
    # rows with jnp.take, so a whole scene chunk runs without touching the
    # host. Numerics are identical to the per-dispatch paths (same jitted
    # step math; tests/test_drivers_e2e.py pins scanned == per-dispatch).

    def _extract_scan_impl(self, variables, images_tb):
        """Encode a (T, B, H, W, 3) image stack into feature pyramids with
        one dispatch: scan of the extractor over T batches of B."""
        def body(_, imgs):
            return None, self.model.apply(
                variables, imgs, method="extract_features")
        _, feats = jax.lax.scan(body, None, images_tb)
        return feats  # tuple of (T, B, ...) per scale

    def _gather_step_inputs(self, bank, images, x):
        # banks may be stored bf16 (halves HBM residency + gather
        # bandwidth for B=16 scene-batch serving); the network consumes
        # f32 — the cast is a no-op for f32 banks
        ref_feats = tuple(
            jnp.take(b, x["ref_idx"], axis=0).astype(jnp.float32)
            for b in bank)
        meas_half = jnp.take(
            bank[0], x["meas_idx"], axis=0).astype(jnp.float32)
        ref_images = jnp.take(images, x["ref_idx"], axis=0)
        return ref_images, ref_feats, meas_half

    def _predict_pair_scan_impl(self, variables, bank, images, K, xs):
        """T stateless pairnet batches in one dispatch. ``xs``: dict of
        per-step arrays — ref_idx (T,B) i32, meas_idx (T,B,V) i32,
        ref_pose (T,B,4,4), meas_pose (T,B,V,4,4), view_mask (T,B,V).
        Returns full-res depth (T, B, H, W)."""
        def body(_, x):
            ref_images, ref_feats, meas_half = self._gather_step_inputs(
                bank, images, x)
            depths = self.model.apply(
                variables, ref_images, ref_feats, meas_half, x["ref_pose"],
                x["meas_pose"], K, x["view_mask"], method="predict_depth")
            return None, depths[0]
        _, out = jax.lax.scan(body, None, xs)
        return out

    def _fusion_scan_impl(self, variables, bank, images, K, state, xs):
        """T lockstep fusionnet steps over B independent scenes in one
        dispatch. ``xs`` as in _predict_pair_scan_impl plus keep (T,B).
        ``state`` threads across calls so a long scene can be split into
        chunks (bounding per-dispatch readback) without breaking the
        recurrence. Returns (new state, depth (T, B, H, W))."""
        def body(state, x):
            carry, prev_pose, prev_depth, has_prev = state
            ref_images, ref_feats, meas_half = self._gather_step_inputs(
                bank, images, x)
            depth, carry, full = self._fusion_step_batch_impl(
                variables, ref_images, ref_feats, meas_half, x["ref_pose"],
                x["meas_pose"], K, x["view_mask"], carry, prev_pose,
                prev_depth, has_prev, x["keep"])
            return ((carry, x["ref_pose"], full, jnp.ones_like(has_prev)),
                    depth)
        return jax.lax.scan(body, state, xs)

    def _encode_predict_impl(self, variables, ref_image, meas_half,
                             ref_pose, meas_poses, K, view_mask,
                             carry, prev_pose, prev_depth, has_prev):
        """Single dispatch: extract reference features AND predict — the
        online driver's hot path (one RPC round trip instead of two)."""
        ref_feats = self.model.apply(variables, ref_image, method="extract_features")
        if self.kind == "pairnet":
            depths = self._predict_pair_impl(
                variables, ref_image, ref_feats, meas_half, ref_pose,
                meas_poses, K, view_mask)
            return depths, ref_feats[0], None, None
        depths, carry, full = self._predict_fusion_impl(
            variables, ref_image, ref_feats, meas_half, ref_pose, meas_poses,
            K, view_mask, carry, prev_pose, prev_depth, has_prev)
        return depths, ref_feats[0], carry, full

    # ---------------------------------------------------------------- host API
    def reset(self):
        """Reset recurrent state (tracking lost / new scene)."""
        self.carry = init_lstm_carry(1, self.H, self.W)
        self.prev_pose = jnp.eye(4, dtype=jnp.float32)[None]
        self.prev_depth = jnp.zeros((1, self.H, self.W), jnp.float32)
        self.has_prev = jnp.zeros((), jnp.float32)

    def encode(self, image: np.ndarray):
        """image (H, W, 3) preprocessed float32 -> feature tuple (device)."""
        return self._extract(self.variables, jnp.asarray(image)[None])

    def predict(
        self,
        ref_image: np.ndarray,
        ref_feats,
        meas_half: Sequence[jnp.ndarray],
        ref_pose: np.ndarray,
        meas_poses: Sequence[np.ndarray],
        K: np.ndarray,
    ) -> np.ndarray:
        """One depth prediction. meas_half: list (<=V) of (1, H/2, W/2, C)
        cached measurement features; returns the full-res depth (H, W)."""
        V = self.V
        n = len(meas_half)
        assert 1 <= n <= V, f"need 1..{V} measurement frames, got {n}"
        mask = np.zeros((1, V), np.float32)
        mask[0, :n] = 1.0
        padded = list(meas_half) + [meas_half[0]] * (V - n)
        meas_stack = jnp.stack([f[0] for f in padded], axis=0)[None]  # (1,V,h,w,c)
        mposes = list(meas_poses) + [meas_poses[0]] * (V - n)
        mposes = jnp.asarray(np.stack(mposes, axis=0).astype(np.float32))[None]

        ref_image_j = jnp.asarray(ref_image.astype(np.float32))[None]
        ref_pose_j = jnp.asarray(ref_pose.astype(np.float32))[None]
        K_j = jnp.asarray(K.astype(np.float32))[None]
        mask_j = jnp.asarray(mask)

        if self.kind == "pairnet":
            depths = self._predict_pair(
                self.variables, ref_image_j, ref_feats, meas_stack,
                ref_pose_j, mposes, K_j, mask_j)
            return np.asarray(depths[0][0])

        depths, carry, full = self._predict_fusion(
            self.variables, ref_image_j, ref_feats, meas_stack,
            ref_pose_j, mposes, K_j, mask_j,
            self.carry, self.prev_pose, self.prev_depth, self.has_prev)
        self.carry = carry
        self.prev_pose = ref_pose_j
        self.prev_depth = full
        self.has_prev = jnp.ones((), jnp.float32)
        return np.asarray(depths[0][0])

    def predict_batch(self, ref_images, ref_feats, meas_half, ref_poses,
                      meas_poses, K, view_mask) -> jnp.ndarray:
        """Batched stateless prediction (pairnet only) for bulk offline
        throughput eval: B independent keyframes per dispatch, sharded over
        the mesh by the caller's input placement (GSPMD propagates it).
        The reference evaluates strictly one keyframe per forward
        (pairnet/run-testing.py:95-160); statelessness makes the batch
        axis free parallelism on TPU.

        ref_images (B,H,W,3); ref_feats tuple of (B,...); meas_half
        (B,V,H/2,W/2,C); ref_poses (B,4,4); meas_poses (B,V,4,4);
        K (B,3,3); view_mask (B,V). Returns full-res depth (B,H,W)."""
        assert self.kind == "pairnet", "batched bulk eval is stateless-only"
        depths = self._predict_pair(
            self.variables, ref_images, ref_feats, meas_half,
            ref_poses, meas_poses, K, view_mask)
        return depths[0]

    def encode_and_predict(
        self,
        ref_image: np.ndarray,
        meas_half: Sequence[jnp.ndarray],
        ref_pose: np.ndarray,
        meas_poses: Sequence[np.ndarray],
        K: np.ndarray,
    ):
        """Fused hot path for the online driver: one dispatch that encodes
        the reference frame and predicts. Returns (depth (H,W) np, cached
        f_half device array (1, H/2, W/2, C))."""
        V = self.V
        n = len(meas_half)
        assert 1 <= n <= V
        mask = np.zeros((1, V), np.float32)
        mask[0, :n] = 1.0
        padded = list(meas_half) + [meas_half[0]] * (V - n)
        meas_stack = jnp.stack([f[0] for f in padded], axis=0)[None]
        mposes = list(meas_poses) + [meas_poses[0]] * (V - n)
        mposes = jnp.asarray(np.stack(mposes, axis=0).astype(np.float32))[None]

        ref_image_j = jnp.asarray(ref_image.astype(np.float32))[None]
        ref_pose_j = jnp.asarray(ref_pose.astype(np.float32))[None]
        K_j = jnp.asarray(K.astype(np.float32))[None]

        depths, f_half, carry, full = self._encode_predict(
            self.variables, ref_image_j, meas_stack, ref_pose_j, mposes,
            K_j, jnp.asarray(mask),
            self.carry, self.prev_pose, self.prev_depth, self.has_prev)
        if self.kind == "fusionnet":
            self.carry = carry
            self.prev_pose = ref_pose_j
            self.prev_depth = full
            self.has_prev = jnp.ones((), jnp.float32)
        return np.asarray(depths[0][0]), f_half
