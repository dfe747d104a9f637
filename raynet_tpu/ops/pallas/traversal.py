"""Pallas TPU kernel: Amanatides-Woo voxel traversal.

Why a kernel: the lax.scan formulation (ops/ray_marching.py) re-reads and
re-writes its (N,)-shaped carries from HBM on every one of the M steps —
at production shapes (N=130k, M=650) that's gigabytes of pure carry traffic.
Here each grid step owns a block of 1024 rays whose DDA state lives in VMEM
registers for the whole march; the only HBM traffic is one read of the
segment endpoints and one write of the (BLOCK, M) flat-index stream.

Semantics identical to ops/ray_marching.voxel_traversal (same eps nudging,
axis tie-breaking, boundary termination); emitted as FLAT grid indices with
-padding already zeroed, plus per-ray counts.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-2
_FLT_MAX = 3.4028235e38  # python float: jnp scalars become captured consts

BLOCK = 1024  # rays per grid step, laid out as (8, 128)
_SUB, _LANE = 8, 128


def _kernel(grid_shape, max_voxels, bbox_ref, sx, sy, sz, ex, ey, ez,
            idx_out, cnt_out):
    gx, gy, gz = grid_shape
    bbox = bbox_ref  # (6,) scalar-prefetch in SMEM

    bin_x = (bbox[3] - bbox[0]) / gx
    bin_y = (bbox[4] - bbox[1]) / gy
    bin_z = (bbox[5] - bbox[2]) / gz

    def load(ref, origin):
        return ref[:] - origin

    start = [load(sx, bbox[0]), load(sy, bbox[1]), load(sz, bbox[2])]
    end = [load(ex, bbox[0]), load(ey, bbox[1]), load(ez, bbox[2])]
    bins = [bin_x, bin_y, bin_z]
    grid_dims = [gx, gy, gz]

    ray = [e - s for s, e in zip(start, end)]
    step = [jnp.where(r >= 0, 1, -1).astype(jnp.int32) for r in ray]
    stepf = [s.astype(jnp.float32) for s in step]

    start = [s + f * b * _EPS for s, f, b in zip(start, stepf, bins)]
    end = [e - f * b * _EPS for e, f, b in zip(end, stepf, bins)]

    cur = [jnp.floor(s / b).astype(jnp.int32) for s, b in zip(start, bins)]
    last = [jnp.floor(e / b).astype(jnp.int32) for e, b in zip(end, bins)]

    inside0 = functools.reduce(
        jnp.logical_and,
        [(c >= 0) & (c < g) for c, g in zip(cur, grid_dims)],
    )

    t_max, t_delta = [], []
    for a in range(3):
        cc = cur[a].astype(jnp.float32) * bins[a]
        boundary = jnp.where(
            (step[a] < 0) & (cc < start[a]), cc, cc + stepf[a] * bins[a]
        )
        t_max.append(
            jnp.where(ray[a] != 0, (boundary - start[a]) / ray[a], _FLT_MAX)
        )
        t_delta.append(
            jnp.where(ray[a] != 0, stepf[a] * bins[a] / ray[a], _FLT_MAX)
        )

    def flat(cx, cy, cz):
        return cx * (gy * gz) + cy * gz + cz

    idx_out[0] = jnp.where(inside0, flat(*cur), 0)
    counts0 = inside0.astype(jnp.int32)

    def body(k, carry):
        # alive_i is int32: Mosaic cannot carry i1 vectors through scf.for
        # Closed-form crossing times (t = t_max0 + n*t_delta, counts in
        # the carry) so crossing order matches ops/ray_marching.py, the
        # BP beam kernel, and the oracle bit for bit — the incremental
        # ``t += t_delta`` drifts ~1e-5 over hundreds of f32 steps.
        cx, cy, cz, nx, ny, nz, alive_i, counts = carry
        tx = t_max[0] + nx.astype(jnp.float32) * t_delta[0]
        ty = t_max[1] + ny.astype(jnp.float32) * t_delta[1]
        tz = t_max[2] + nz.astype(jnp.float32) * t_delta[2]
        at_last = (cx == last[0]) & (cy == last[1]) & (cz == last[2])
        advance = (alive_i > 0) & ~at_last

        # Nested-if tie-breaking parity (ray_tracing.pyx:169-194):
        #   tx < ty ? (tx < tz ? X : Z) : (ty < tz ? Y : Z)
        move_x = (tx < ty) & (tx < tz)
        move_y = ~(tx < ty) & (ty < tz)
        move_z = ~move_x & ~move_y

        ncx = cx + jnp.where(move_x, step[0], 0)
        ncy = cy + jnp.where(move_y, step[1], 0)
        ncz = cz + jnp.where(move_z, step[2], 0)

        oob = (
            (move_x & ((ncx < 0) | (ncx >= gx)))
            | (move_y & ((ncy < 0) | (ncy >= gy)))
            | (move_z & ((ncz < 0) | (ncz >= gz)))
        )
        emit = advance & ~oob

        cx = jnp.where(emit, ncx, cx)
        cy = jnp.where(emit, ncy, cy)
        cz = jnp.where(emit, ncz, cz)
        nx = nx + (emit & move_x).astype(jnp.int32)
        ny = ny + (emit & move_y).astype(jnp.int32)
        nz = nz + (emit & move_z).astype(jnp.int32)

        idx_out[k] = jnp.where(emit, flat(cx, cy, cz), 0)
        emit_i = emit.astype(jnp.int32)
        counts = counts + emit_i
        return cx, cy, cz, nx, ny, nz, emit_i, counts

    zero_i = jnp.zeros_like(cur[0])
    *_, counts = jax.lax.fori_loop(
        1,
        max_voxels,
        body,
        (cur[0], cur[1], cur[2], zero_i, zero_i, zero_i,
         inside0.astype(jnp.int32), counts0),
    )
    cnt_out[:] = counts


@functools.partial(
    jax.jit, static_argnames=("grid_shape", "max_voxels", "interpret")
)
def voxel_traversal_flat_pallas(
    bbox, ray_start, ray_end, grid_shape, max_voxels, interpret=False
):
    """Traversal emitting (N, M) FLAT voxel indices + (N,) counts.

    Arguments match ops.ray_marching.voxel_traversal; ``interpret`` runs the
    kernel in interpreter mode (CPU tests).
    """
    n = ray_start.shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    grid_shape = tuple(int(g) for g in grid_shape)

    def pad(x):
        out = jnp.zeros((n_pad,), dtype=x.dtype)
        return out.at[:n].set(x)

    cols = [pad(ray_start[:, a]).reshape(-1, _LANE) for a in range(3)] + [
        pad(ray_end[:, a]).reshape(-1, _LANE) for a in range(3)
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec(
                (_SUB, _LANE), lambda i, _: (i, 0), memory_space=pltpu.VMEM
            )
        ]
        * 6,
        out_specs=(
            # step-major layout (M, N/128, 128): row k is one (8,128) store
            pl.BlockSpec(
                (max_voxels, _SUB, _LANE), lambda i, _: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_SUB, _LANE), lambda i, _: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
    )

    idx, cnt = pl.pallas_call(
        functools.partial(_kernel, grid_shape, max_voxels),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(
                (max_voxels, n_pad // _LANE, _LANE), jnp.int32
            ),
            jax.ShapeDtypeStruct((n_pad // _LANE, _LANE), jnp.int32),
        ),
        interpret=interpret,
    )(jnp.asarray(bbox, jnp.float32).reshape(6), *cols)

    idx = jnp.transpose(idx, (1, 2, 0)).reshape(n_pad, max_voxels)
    return idx[:n], cnt.reshape(-1)[:n]
