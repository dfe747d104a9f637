"""Slow, obviously-correct numpy oracles used to validate the JAX ops.

These re-derive the reference algorithms (Amanatides-Woo DDA, ray-potential
BP recurrences, top-2 depth->voxel interpolation) as straightforward
sequential numpy code, mirroring the reference's numpy backends which played
the same oracle role for its CUDA/TF kernels.
"""
import numpy as np

_EPS = 1e-2


def voxel_traversal_oracle(bbox, grid_shape, ray_start, ray_end, max_voxels):
    """Sequential DDA matching raynet/ray_marching/ray_tracing.pyx:64-199."""
    bbox = np.asarray(bbox, dtype=np.float32).reshape(6)
    grid = np.asarray(grid_shape, dtype=np.int32)
    bin_size = (bbox[3:] - bbox[:3]) / grid

    start = np.asarray(ray_start, dtype=np.float32) - bbox[:3]
    end = np.asarray(ray_end, dtype=np.float32) - bbox[:3]
    ray = end - start
    step = np.where(ray >= 0, 1, -1).astype(np.int32)

    start = start + step * bin_size * _EPS
    end = end - step * bin_size * _EPS

    cur = np.floor(start / bin_size).astype(np.int32)
    last = np.floor(end / bin_size).astype(np.int32)

    out = np.zeros((max_voxels, 3), dtype=np.int32)
    if np.any(cur < 0) or np.any(cur >= grid):
        return out, 0

    FLT_MAX = np.float32(3.4028235e38)
    t_max = np.full(3, FLT_MAX, dtype=np.float32)
    t_delta = np.full(3, FLT_MAX, dtype=np.float32)
    for a in range(3):
        if ray[a] != 0:
            cc = cur[a] * bin_size[a]
            if step[a] < 0 and cc < start[a]:
                boundary = cc
            else:
                boundary = cc + step[a] * bin_size[a]
            t_max[a] = (boundary - start[a]) / ray[a]
            t_delta[a] = step[a] * bin_size[a] / ray[a]

    ii = 0
    out[ii] = cur
    ii += 1
    ncross = np.zeros(3, dtype=np.int32)
    while not np.array_equal(cur, last) and ii < max_voxels:
        # closed-form crossing times (t = t_max0 + n*t_delta): matches
        # ops/ray_marching.py, ops/pallas/traversal.py and the fused BP
        # beam kernel, which all order crossings by the same values
        t_cur = (
            t_max + ncross.astype(np.float32) * t_delta
        ).astype(np.float32)
        if t_cur[0] < t_cur[1]:
            axis = 0 if t_cur[0] < t_cur[2] else 2
        else:
            axis = 1 if t_cur[1] < t_cur[2] else 2
        cur = cur.copy()
        cur[axis] += step[axis]
        if cur[axis] < 0 or cur[axis] >= grid[axis]:
            return out, ii
        ncross[axis] += 1
        out[ii] = cur
        ii += 1
    return out, ii


def single_ray_bp_oracle(grid_acc, flat_idx, messages_pon, s):
    """Per-ray BP message update, mirroring mrf_np.py:11-126 (flat grid)."""
    pon = grid_acc[flat_idx] - messages_pon
    mx = np.maximum(0.0, pon)
    t1 = np.exp(0.0 - mx)
    t2 = np.exp(pon - mx)
    mu = np.clip(t2 / (t2 + t1), 1e-4, 1 - 1e-4)

    neg_cumprod = np.hstack([[1.0], (1 - mu).cumprod()])
    m = len(s)
    new = np.zeros((2, m), dtype=np.float64)
    common = np.hstack([[0.0], mu * neg_cumprod[:-1] * s])[:-1].cumsum()
    new[:] += common
    new[1] += neg_cumprod[:-1] * s
    new[0] += (
        np.hstack([mu * neg_cumprod[:-1] * s, [0.0]])[::-1].cumsum()[::-1][1:]
        / (1 - mu)
    )
    pos = new[1] / (new[1] + new[0])
    return np.log(pos) - np.log(1 - pos)


def clip_and_renorm_oracle(x, eps=1e-5):
    x = np.clip(x, eps, 1 - eps)
    return x / x.sum()


def belief_propagation_oracle(
    S, flat_idx, counts, grid_size, gamma=0.05, bp_iterations=3
):
    """Whole-batch BP oracle on a flattened grid (mrf_np.py:243-330)."""
    n, m = S.shape
    msgs = np.zeros((n, m), dtype=np.float64)
    prior = np.log(gamma) - np.log(1 - gamma)
    grid_prev = np.full(grid_size, prior, dtype=np.float64)
    for _ in range(bp_iterations):
        grid_new = np.full(grid_size, prior, dtype=np.float64)
        for r in range(n):
            c = counts[r]
            if c <= 1:
                continue
            pon = single_ray_bp_oracle(
                grid_prev,
                flat_idx[r, :c],
                msgs[r, :c],
                clip_and_renorm_oracle(S[r, :c].astype(np.float64)),
            )
            np.add.at(grid_new, flat_idx[r, :c], pon)
            msgs[r, :c] = pon
        grid_prev = grid_new
    return grid_prev, msgs


def depth_estimate_oracle(S, flat_idx, counts, msgs, grid_acc):
    """Posterior depth distribution oracle (mrf_np.py:129-203)."""
    n, m = S.shape
    out = np.zeros((n, m), dtype=np.float64)
    for r in range(n):
        c = counts[r]
        if c <= 1:
            continue
        pon = grid_acc[flat_idx[r, :c]] - msgs[r, :c]
        mx = np.maximum(0.0, pon)
        t1 = np.exp(0.0 - mx)
        t2 = np.exp(pon - mx)
        mu = np.clip(t2 / (t2 + t1), 1e-4, 1 - 1e-4)
        neg_cumprod = np.hstack([[1.0], (1 - mu).cumprod()])
        p = mu * neg_cumprod[:-1] * clip_and_renorm_oracle(
            S[r, :c].astype(np.float64)
        )
        out[r, :c] = p / p.sum()
    return out


def depth_to_voxels_li2_oracle(voxel_centers, points, s):
    """Top-2 inverse-distance interpolation oracle
    (planes_voxels_mapping.py:165-211). voxel_centers: (3, C); points: (3, D).
    """
    _, C = voxel_centers.shape
    D = len(s)
    ray = (points[:, -1] - points[:, 0]).reshape(3, 1)
    vdir = voxel_centers - points[:, 0].reshape(3, 1)
    t = ray.T.dot(vdir) / ray.T.dot(ray)
    t = np.clip(t, 1e-4, 1 - 1e-4)

    t_points = np.linspace(0, 1, D)
    distances = np.abs(t_points.reshape(-1, 1) - t.reshape(1, -1))
    neighbors = distances.argsort(axis=0)
    coeff = distances[neighbors[:2, :], np.arange(C)]
    coeff = coeff / coeff.sum(axis=0, keepdims=True)
    coeff = 1.0 - coeff
    s_new = (s[neighbors[:2, :]] * coeff).sum(axis=0)
    return s_new / s_new.sum()
