"""Sharded training steps with the reference's staged-unfreeze schedule.

The reference rebuilds an Adam optimizer over a different module subset per
stage (fusionnet/run-training.py:118-181: LSTM+decoder -> +FPN+encoder ->
everything; pairnet 2 stages). Here each stage is an optax chain with a
`masked` transform over parameter-path labels; switching stages rebuilds
opt_state (which also resets Adam moments, matching the reference).

Batch is sharded over the mesh's data axis; parameters/optimizer state are
replicated. XLA inserts the gradient all-reduce (psum over ICI) from the
output shardings — no hand-written collectives.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import optax

from dvmvs_tpu.models.training_heads import (
    fusionnet_train_sequence,
    pairnet_train_pair,
)
from dvmvs_tpu.config import MEAN_RGB, SCALE_RGB, STD_RGB
from dvmvs_tpu.parallel.mesh import batch_sharding, replicated_sharding
from dvmvs_tpu.utils.losses import calculate_loss


def decode_wire_batch(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """On-device decode of the COMPACT wire format (images uint8, depths
    float16 — dataset wire_compact=True): cast + ImageNet normalization
    happen inside the jitted step, so host->device traffic drops ~3.6x.
    That matters through this sandbox's RPC relay and on real hosts (PCIe);
    shipping uint8 pixels and normalizing on device is the standard
    high-throughput TPU input-pipeline shape. float32 batches pass through
    unchanged — dtype is static at trace time, so this is free."""
    if batch["images"].dtype == jnp.uint8:
        x = batch["images"].astype(jnp.float32) / jnp.float32(SCALE_RGB)
        mean = jnp.asarray(MEAN_RGB, jnp.float32)
        std = jnp.asarray(STD_RGB, jnp.float32)
        batch = dict(batch, images=(x - mean) / std)
    if batch["depths"].dtype != jnp.float32:
        batch = dict(batch, depths=batch["depths"].astype(jnp.float32))
    return batch

# Unfreeze schedules (top-level module names), per reference driver.
FUSIONNET_STAGES: List[List[str]] = [
    ["lstm_fusion", "cost_volume_decoder"],
    ["feature_shrinker", "cost_volume_encoder", "lstm_fusion", "cost_volume_decoder"],
    ["feature_extractor", "feature_shrinker", "cost_volume_encoder", "lstm_fusion",
     "cost_volume_decoder"],
]
PAIRNET_STAGES: List[List[str]] = [
    ["feature_shrinker", "cost_volume_encoder", "cost_volume_decoder"],
    ["feature_extractor", "feature_shrinker", "cost_volume_encoder",
     "cost_volume_decoder"],
]

LOSS_KEY = {"L1": "l1", "L1-inv": "l1_inv", "L1-rel": "l1_rel", "Huber": "huber"}


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def stage_parameter_mask(params, trainable_modules: Sequence[str]):
    """Pytree of 'train'/'freeze' labels by top-level module name."""
    return {
        name: jax.tree.map(
            lambda _: "train" if name in trainable_modules else "freeze", sub
        )
        for name, sub in params.items()
    }


def make_optimizer(params, trainable_modules: Sequence[str],
                   learning_rate: float = 1e-4, beta1: float = 0.9,
                   beta2: float = 0.999, weight_decay: float = 0.0):
    tx = optax.adam(learning_rate, b1=beta1, b2=beta2) if weight_decay == 0.0 \
        else optax.adamw(learning_rate, b1=beta1, b2=beta2, weight_decay=weight_decay)
    labels = stage_parameter_mask(params, trainable_modules)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )


def create_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def _per_step_loss(preds: Sequence[jnp.ndarray], gt: jnp.ndarray, loss_type: str):
    """Sum over scales of (loss_sum / valid_count); gt (B, H, W)."""
    key = LOSS_KEY[loss_type]
    total = 0.0
    metrics = {}
    for pred in preds:
        terms = calculate_loss(gt, pred)
        denom = jnp.maximum(terms["valid_count"], 1.0)
        total = total + terms[key] / denom
        metrics = terms  # last scale (= full res for the reference ordering)
    return total, metrics


def fusionnet_loss_fn(params, batch_stats, model, batch, loss_type: str = "L1-inv",
                      bn_train: bool = True):
    """Loss over a subsequence batch: images (B,S,H,W,3), depths (B,S,H,W),
    poses (B,S,4,4), K (B,3,3)."""
    preds, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["images"], batch["depths"], batch["poses"], batch["K"], bn_train,
        method=fusionnet_train_sequence, mutable=["batch_stats"],
    )
    S1 = preds[0].shape[0]
    gts = jnp.swapaxes(batch["depths"][:, 1:], 0, 1)  # (S-1, B, H, W)

    def step_loss(t_preds, t_gt):
        return _per_step_loss(t_preds, t_gt, loss_type)

    losses, metrics = jax.vmap(step_loss)(preds, gts)
    total = jnp.sum(losses)
    last = {k: v[-1] for k, v in metrics.items()}
    return total, (mutated["batch_stats"], {"loss": total, **last})


def pairnet_loss_fn(params, batch_stats, model, batch, flip_mask,
                    loss_type: str = "L1-inv", two_way: bool = False,
                    bn_train: bool = True):
    outputs, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["images"], batch["depths"], batch["poses"], batch["K"],
        flip_mask,
        method=functools.partial(pairnet_train_pair, two_way=two_way,
                                 bn_train=bn_train),
        mutable=["batch_stats"],
    )
    total = 0.0
    last = {}
    for preds, gt in outputs:
        l, last = _per_step_loss(preds, gt, loss_type)
        total = total + l
    return total, (mutated["batch_stats"], {"loss": total, **last})


def make_train_step(model, tx, mesh=None, kind: str = "fusionnet",
                    loss_type: str = "L1-inv", two_way: bool = False,
                    donate: bool = True, freeze_bn: bool = False,
                    compiler_options=None):
    """Build the jitted, sharded train step.

    Returns step(state, batch[, rng]) -> (state, metrics). With a mesh, the
    batch is sharded over the data axis and state is replicated.
    compiler_options: optional dict forwarded to jax.jit — the multi-chip
    dryrun gate uses reduced XLA optimization to keep its CPU compile fast.
    """

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        batch = decode_wire_batch(batch)
        if kind == "fusionnet":
            def lf(p):
                return fusionnet_loss_fn(p, state.batch_stats, model, batch,
                                         loss_type, bn_train=not freeze_bn)
        else:
            n_dirs = 2 if two_way else 1
            flip_mask = jax.random.uniform(rng, (n_dirs,)) > 0.5

            def lf(p):
                return pairnet_loss_fn(p, state.batch_stats, model, batch,
                                       flip_mask, loss_type, two_way,
                                       bn_train=not freeze_bn)

        (loss, (new_stats, metrics)), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(state.step + 1, new_params, new_stats, new_opt),
            metrics,
        )

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else (),
                       compiler_options=compiler_options)

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
        compiler_options=compiler_options,
    )


def make_eval_step(model, kind: str = "fusionnet", loss_type: str = "L1-inv",
                   mesh=None):
    def step(state: TrainState, batch):
        batch = decode_wire_batch(batch)
        # validation runs with BN in eval mode (running stats), like the
        # reference's switch_mode (dvmvs/train.py:13-15, 124)
        if kind == "fusionnet":
            loss, (_, metrics) = fusionnet_loss_fn(
                state.params, state.batch_stats, model, batch, loss_type,
                bn_train=False)
        else:
            loss, (_, metrics) = pairnet_loss_fn(
                state.params, state.batch_stats, model, batch,
                jnp.zeros((1,), bool), loss_type, False, bn_train=False)
        return metrics

    if mesh is None:
        return jax.jit(step)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(repl, data), out_shardings=repl)
