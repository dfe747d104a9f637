"""Loss functions over per-ray depth distributions.

Parity: raynet/tf_implementations/loss_functions.py. All losses take
(y_true, y_pred) of shape (B, D) and return per-sample losses (B,); callers
take the mean.
"""
import jax.numpy as jnp


def emd(y_true, y_pred):
    """Earth mover's distance: mean |cumsum(y_true - y_pred)| over D."""
    return jnp.abs(jnp.cumsum(y_true - y_pred, axis=-1)).mean(axis=-1)


def squared_emd(y_true, y_pred):
    """Squared EMD: sum of squared prefix sums."""
    return (jnp.cumsum(y_true - y_pred, axis=-1) ** 2).sum(axis=-1)


def expected_squared_error(y_true, y_pred, voxel_center_dists):
    """|E_true[depth] - E_pred[depth]| with depths taken as camera-center
    distances of the per-ray voxel centers.

    Arguments
    ---------
        y_true, y_pred: (B, M) distributions over visited voxels
        voxel_center_dists: (B, M) distance of each voxel center from the
            reference camera center
    (parity: loss_functions.py:14-35, with the gather/dist computation done
    by the caller).
    """
    d_true = (y_true * voxel_center_dists).sum(axis=-1)
    d_pred = (y_pred * voxel_center_dists).sum(axis=-1)
    return jnp.abs(d_true - d_pred)


def mse(y_true, y_pred):
    return ((y_true - y_pred) ** 2).mean(axis=-1)


def categorical_crossentropy(y_true, y_pred, eps=1e-7):
    return -(y_true * jnp.log(jnp.clip(y_pred, eps, 1.0))).sum(axis=-1)


def mae(y_true, y_pred):
    """Mean absolute error metric (models.py:77-80)."""
    return jnp.abs(y_true - y_pred).mean()


def mde(y_true, y_pred):
    """Mean depth-plane error: |argmax distance| metric (models.py:83-87)."""
    return jnp.abs(
        jnp.argmax(y_true, axis=-1) - jnp.argmax(y_pred, axis=-1)
    ).astype(jnp.float32).mean()


def loss_factory(loss):
    return {
        "emd": emd,
        "squared_emd": squared_emd,
        "mse": mse,
        "categorical_crossentropy": categorical_crossentropy,
    }.get(loss, emd)
