"""Worker process for the 2-process jax.distributed smoke test
(launched by tests/test_multihost.py; not collected by pytest).

Each process owns 2 virtual CPU devices; together they form a 4-device
global mesh. Runs ONE sharded pairnet train step through the exact
make_train_step / make_mesh path the --multihost training driver uses
(apps/run_training.py), proving the distributed init + multi-controller
pjit program executes: global batch from per-process shards, replicated
params, grad all-reduce inserted from the shardings.
"""

import os
import sys


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()

    import numpy as np

    from dvmvs_tpu.models.pairnet import PairNet
    from dvmvs_tpu.models.training_heads import pairnet_train_pair
    from dvmvs_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
    from dvmvs_tpu.parallel.train import (
        PAIRNET_STAGES,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    devices = jax.devices()
    assert len(devices) == 2 * num_processes, devices
    mesh = make_mesh(devices=devices)
    repl = replicated_sharding(mesh)
    data_sh = batch_sharding(mesh)

    # global batch B = n_devices; each process contributes its local half
    B_global, S, H, W = len(devices), 2, 64, 64
    B_local = B_global // num_processes
    rs = np.random.RandomState(process_id)
    poses = np.stack([[np.eye(4, dtype=np.float32)] * S] * B_local)
    poses[:, 1, 0, 3] += rs.uniform(0.1, 0.2, B_local).astype(np.float32)
    K = np.array([[16.0, 0, W / 2], [0, 16.0, H / 2], [0, 0, 1]], np.float32)
    local = {
        "images": rs.randn(B_local, S, H, W, 3).astype(np.float32) * 0.1,
        "depths": rs.uniform(0.5, 8.0, (B_local, S, H, W)).astype(np.float32),
        "poses": poses,
        "K": np.stack([K] * B_local),
    }
    batch = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(data_sh, x), local)

    model = PairNet()
    # identical seed on every process -> identical replicated params
    with jax.default_device(jax.local_devices()[0]):
        variables = model.init(
            jax.random.PRNGKey(0), local["images"], local["depths"],
            local["poses"], local["K"], np.zeros((1,), bool),
            method=pairnet_train_pair)
        rng = jax.random.PRNGKey(0)

    tx = make_optimizer(variables["params"], PAIRNET_STAGES[-1])
    state = create_train_state(variables, tx)
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        state)
    rng = jax.make_array_from_process_local_data(repl, np.asarray(rng))

    step = make_train_step(model, tx, mesh=mesh, kind="pairnet", donate=False)
    state2, metrics = step(state, batch, rng)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    leaf = jax.tree.leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated, leaf.sharding
    print(f"MULTIHOST OK process={process_id} loss={loss:.4f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
