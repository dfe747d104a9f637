"""Orbax checkpoint/resume roundtrip for training states."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from raynet_tpu.train.checkpointing import CheckpointManager
from raynet_tpu.train.pretrain import create_pretrain_state, make_pretrain_step


@pytest.mark.slow
def test_checkpoint_resume_roundtrip(tmp_path, rng):
    d, n, h, w, c = 2, 2, 11, 11, 1
    model, state, loss_fn, wd = create_pretrain_state(
        jax.random.PRNGKey(0), (d, n, h, w, c), lr=1e-3
    )
    train_step, _ = make_pretrain_step(model, loss_fn, wd)

    x = jnp.asarray(rng.rand(2, d, n, h, w, c), jnp.float32)
    y = jnp.asarray(np.eye(d, dtype=np.float32)[rng.randint(0, d, 2)])
    for _ in range(3):
        state, _ = train_step(state, x, x, y)

    mgr = CheckpointManager(tmp_path / "ckpt", save_interval_steps=1)
    mgr.save(3, state, force=True)
    mgr.wait()

    _, fresh, _, _ = create_pretrain_state(
        jax.random.PRNGKey(1), (d, n, h, w, c), lr=1e-3
    )
    restored, step = mgr.restore(fresh)
    assert step == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # optimizer state restored too
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    mgr.close()


def test_restore_without_checkpoint(tmp_path):
    _, state, _, _ = create_pretrain_state(
        jax.random.PRNGKey(0), (2, 2, 11, 11, 1), lr=1e-3
    )
    mgr = CheckpointManager(tmp_path / "empty")
    restored, step = mgr.restore(state)
    assert step is None and restored is state
    mgr.close()
