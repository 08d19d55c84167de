"""Checkpoint (de)serialization unit tests — fast tier."""

import numpy as np
def test_load_checkpoint_preserves_device_placement(tmp_path):
    """load_checkpoint must hand back leaves with the TEMPLATE's placement.

    flax.serialization.from_bytes restores host numpy; if an inference
    engine's device-committed variables are replaced by numpy leaves, every
    dispatch re-uploads the full parameter pytree (~139 MB for fusionnet =
    ~2.9 s/keyframe through the sandbox relay, a measured 38x slowdown vs
    the 77 ms step). Regression for the round-5 serving fix."""
    import jax
    import jax.numpy as jnp

    from dvmvs_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                       "b": jnp.zeros((3,))}}
    tree = jax.device_put(tree)  # committed device arrays
    path = tmp_path / "ckpt.msgpack"
    save_checkpoint(str(path), tree)

    # device-committed template -> device-committed result, values restored
    out = load_checkpoint(str(path), jax.tree.map(jnp.zeros_like, tree))
    for t, o in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        assert isinstance(o, jax.Array), type(o)
        assert o.sharding == t.sharding
        np.testing.assert_array_equal(np.asarray(o), np.asarray(t))

    # host-numpy template -> left on host (training flows manage placement)
    host_tmpl = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), tree)
    out_host = load_checkpoint(str(path), host_tmpl)
    assert all(isinstance(l, np.ndarray) and not isinstance(l, jax.Array)
               for l in jax.tree.leaves(out_host))


    # template=None -> raw restored dict (run_testing_baseline.py:105)
    raw = load_checkpoint(str(path), None)
    assert isinstance(raw, dict) and "params" in raw
