"""Hartmann baseline: pretraining step and forward pass smoke."""
import numpy as np
import jax
import jax.numpy as jnp

from raynet_tpu.train.pretrain import create_hartmann_pretrain_state


def test_hartmann_pretrain_step(rng):
    # hartmann_cnn needs >= 24x24 inputs for its conv5-pool-conv5-pool-conv5
    # similarity head to produce a 1x1 output
    ps = (32, 32, 3)
    model, state, train_step = create_hartmann_pretrain_state(
        jax.random.PRNGKey(0), ps, lr=1e-2
    )
    b = 4
    patches = jnp.asarray(rng.rand(b, 5, *ps), jnp.float32)
    y = np.zeros((b, 1, 1, 2), dtype=np.float32)
    y[:, 0, 0, rng.randint(0, 2, b)] = 1.0
    y = jnp.asarray(y)

    first = None
    for _ in range(10):
        state, metrics = train_step(state, patches, y)
        if first is None:
            first = float(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < first
