"""Optimizer and regularizer factories (optax).

Parity: raynet/models.py:278-291 — Adam/SGD with clipvalue (default 1) and
optional clipnorm, plus l2 weight decay.
"""
import optax


def optimizer_factory(optimizer, lr, momentum=None, clipnorm=0.0, clipvalue=1.0):
    chain = []
    if clipvalue:
        chain.append(optax.clip(clipvalue))
    if clipnorm:
        chain.append(optax.clip_by_global_norm(clipnorm))
    if optimizer == "Adam":
        chain.append(optax.adam(lr))
    elif optimizer == "SGD":
        chain.append(optax.sgd(lr, momentum=momentum))
    else:
        raise ValueError("unknown optimizer %r" % (optimizer,))
    return optax.chain(*chain)


def kernel_regularizer_factory(regularizer_factor):
    """Returns the l2 factor (weight-decay loss term coefficient) or None."""
    if regularizer_factor == 0.0:
        return None
    return regularizer_factor


def l2_loss(params, factor):
    """Sum of l2 penalties over all kernel parameters."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(params)
    return factor * sum(jnp.sum(p ** 2) for p in leaves if p.ndim > 1)
