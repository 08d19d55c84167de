"""Training step tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvmvs_tpu.models.fusionnet import FusionNet
from dvmvs_tpu.models.pairnet import PairNet
from dvmvs_tpu.models.training_heads import fusionnet_train_sequence
from dvmvs_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from dvmvs_tpu.parallel.train import (
    FUSIONNET_STAGES,
    PAIRNET_STAGES,
    create_train_state,
    make_optimizer,
    make_train_step,
    stage_parameter_mask,
)
from tests.conftest import random_pose

pytestmark = pytest.mark.heavy

H = W = 64
S = 3


def _batch(rng, B):
    poses = np.stack(
        [[random_pose(rng, 0.05) for _ in range(S)] for _ in range(B)]
    ).astype(np.float32)
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    return {
        "images": jnp.asarray(rng.randn(B, S, H, W, 3).astype(np.float32) * 0.1),
        "depths": jnp.asarray(rng.uniform(0.5, 8.0, (B, S, H, W)).astype(np.float32)),
        "poses": jnp.asarray(poses),
        "K": jnp.asarray(np.stack([K] * B)),
    }


@pytest.fixture(scope="module")
def fusion_setup():
    model = FusionNet()
    rng = np.random.RandomState(0)
    batch = _batch(rng, 2)
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["images"], batch["depths"], batch["poses"], batch["K"],
        method=fusionnet_train_sequence,
    )
    return model, variables, batch


def test_fusionnet_train_sequence_shapes(fusion_setup):
    model, variables, batch = fusion_setup
    preds, mutated = model.apply(
        variables, batch["images"], batch["depths"], batch["poses"], batch["K"],
        method=fusionnet_train_sequence, mutable=["batch_stats"],
    )
    assert len(preds) == 5
    assert preds[0].shape == (S - 1, 2, H, W)  # full res
    assert preds[4].shape == (S - 1, 2, H // 16, W // 16)
    # batch stats must actually update in train mode
    old = jax.tree.leaves(variables["batch_stats"])[0]
    new = jax.tree.leaves(mutated["batch_stats"])[0]
    assert float(jnp.abs(old - new).max()) > 0


def test_fusionnet_loss_decreases(fusion_setup):
    model, variables, batch = fusion_setup
    tx = make_optimizer(variables["params"], FUSIONNET_STAGES[2], learning_rate=1e-3)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, kind="fusionnet", donate=False)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_stage_mask_freezes_modules(fusion_setup):
    model, variables, batch = fusion_setup
    tx = make_optimizer(variables["params"], FUSIONNET_STAGES[0])
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, kind="fusionnet", donate=False)
    state2, _ = step(state, batch, jax.random.PRNGKey(0))
    fe_before = jax.tree.leaves(state.params["feature_extractor"])[0]
    fe_after = jax.tree.leaves(state2.params["feature_extractor"])[0]
    np.testing.assert_array_equal(np.asarray(fe_before), np.asarray(fe_after))
    dec_before = jax.tree.leaves(state.params["cost_volume_decoder"])[0]
    dec_after = jax.tree.leaves(state2.params["cost_volume_decoder"])[0]
    assert float(jnp.abs(dec_before - dec_after).max()) > 0


def test_fusionnet_train_step_on_8_device_mesh(fusion_setup):
    model, variables, _ = fusion_setup
    mesh = make_mesh()
    assert mesh.size == 8
    rng = np.random.RandomState(1)
    batch = _batch(rng, 8)
    batch = jax.device_put(batch, batch_sharding(mesh))

    tx = make_optimizer(variables["params"], FUSIONNET_STAGES[2])
    state = create_train_state(variables, tx)
    state = jax.device_put(state, replicated_sharding(mesh))
    # Reduced XLA optimization: the full-opt CPU compile of the sharded BPTT
    # step takes minutes on few-core hosts and widens the 8-thread
    # in-process collective rendezvous skew past its 40 s abort (same
    # rationale as dryrun_multichip; conftest raises the rendezvous
    # timeouts before backend init).
    step = make_train_step(
        model, tx, mesh=mesh, kind="fusionnet", donate=False,
        compiler_options={"xla_backend_optimization_level": "1"})
    state2, metrics = step(state, batch, jax.device_put(jax.random.PRNGKey(0), replicated_sharding(mesh)))
    assert np.isfinite(float(metrics["loss"]))
    # updated params stay replicated
    leaf = jax.tree.leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_pairnet_train_step(rng):
    model = PairNet()
    B = 2
    poses = np.stack(
        [[random_pose(rng, 0.05) for _ in range(2)] for _ in range(B)]
    ).astype(np.float32)
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    batch = {
        "images": jnp.asarray(rng.randn(B, 2, H, W, 3).astype(np.float32) * 0.1),
        "depths": jnp.asarray(rng.uniform(0.5, 8.0, (B, 2, H, W)).astype(np.float32)),
        "poses": jnp.asarray(poses),
        "K": jnp.asarray(np.stack([K] * B)),
    }
    from dvmvs_tpu.models.training_heads import pairnet_train_pair
    variables = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["depths"], batch["poses"],
        batch["K"], jnp.zeros((2,), bool), method=pairnet_train_pair,
    )
    tx = make_optimizer(variables["params"], PAIRNET_STAGES[1], learning_rate=1e-3)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, kind="pairnet", two_way=True, donate=False)
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_stage_epoch_budget_schedule_and_resume():
    """Epoch budgeting per unfreeze stage, incl. mid-stage resume (the
    global epoch counter is past the stage start after a crash-resume)."""
    from dvmvs_tpu.apps.run_training import stage_epoch_budget

    # pairnet fresh run: 2 stages, finetune=2, total 6 -> [2, 4]
    assert stage_epoch_budget(2, 0, 0, 2, 6) == 2
    assert stage_epoch_budget(2, 1, 2, 2, 6) == 4
    # fusionnet fresh run: 3 stages, finetune=1, total 6 -> [1, 1, 4]
    assert stage_epoch_budget(3, 0, 0, 1, 6) == 1
    assert stage_epoch_budget(3, 1, 1, 1, 6) == 1
    assert stage_epoch_budget(3, 2, 2, 1, 6) == 4
    # resume mid last stage (pairnet epoch 3 of 6, stage 1) -> 3 left
    assert stage_epoch_budget(2, 1, 3, 2, 6) == 3
    # resume mid a NON-last stage (pairnet epoch 1 of 6, stage 0): one of
    # stage 0's two epochs is done -> 1 left, and stage 1 then gets 4
    assert stage_epoch_budget(2, 0, 1, 2, 6) == 1
    assert stage_epoch_budget(2, 1, 2, 2, 6) == 4
    # sanity: total epochs across stages always sums to `total`
    for resume_epoch in range(6):
        stage = min(resume_epoch // 2, 1)
        total = 0
        e = resume_epoch
        for s in range(stage, 2):
            n = stage_epoch_budget(2, s, e, 2, 6)
            total += n
            e += n
        assert e == 6, (resume_epoch, e)


def test_train_step_accepts_compact_wire_batch(rng):
    """The jitted train step dtype-dispatches on the compact wire format
    (uint8 images + f16 depths, decode_wire_batch) and produces a loss in
    the same ballpark as the float32 pipeline for the same underlying
    pixels."""
    from dvmvs_tpu.parallel.train import decode_wire_batch

    model = PairNet()
    B = 2
    poses = np.stack(
        [[random_pose(rng, 0.05) for _ in range(2)] for _ in range(B)]
    ).astype(np.float32)
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    u8 = rng.randint(0, 255, (B, 2, H, W, 3)).astype(np.uint8)
    depths = rng.uniform(0.5, 8.0, (B, 2, H, W)).astype(np.float32)
    batch_u8 = {
        "images": jnp.asarray(u8),
        "depths": jnp.asarray(depths.astype(np.float16)),
        "poses": jnp.asarray(poses),
        "K": jnp.asarray(np.stack([K] * B)),
    }
    batch_f32 = dict(batch_u8, images=decode_wire_batch(batch_u8)["images"],
                     depths=jnp.asarray(depths))

    from dvmvs_tpu.models.training_heads import pairnet_train_pair
    variables = model.init(
        jax.random.PRNGKey(0), batch_f32["images"], batch_f32["depths"],
        batch_f32["poses"], batch_f32["K"], jnp.zeros((1,), bool),
        method=pairnet_train_pair,
    )
    tx = make_optimizer(variables["params"], PAIRNET_STAGES[1],
                        learning_rate=1e-3)
    step = make_train_step(model, tx, kind="pairnet", two_way=False,
                           donate=False)

    state = create_train_state(variables, tx)
    _, m_u8 = step(state, batch_u8, jax.random.PRNGKey(0))
    state = create_train_state(variables, tx)
    _, m_f32 = step(state, batch_f32, jax.random.PRNGKey(0))
    a, b = float(m_u8["loss"]), float(m_f32["loss"])
    assert np.isfinite(a) and np.isfinite(b)
    # identical pixels up to the f16 depth cast -> near-identical loss
    assert abs(a - b) < 0.05 * max(abs(b), 1.0), (a, b)

