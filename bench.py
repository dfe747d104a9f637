"""Benchmark: plane-sweep depth-estimation throughput (rays/second).

Reproduces the reference's headline number — the multi_view_cnn CUDA path
scored a sub-megapixel Aerial frame in ~0.065 s, i.e. ~1e6 rays/s of
plane-sweep scoring on a 2016 TITAN X (docs/getting-started.md:119-157,
BASELINE.md). Same pipeline shape here: D=32 depth hypotheses, 5 views,
F=32 features, bbox sampling, argmax depth — measured on whatever device
JAX reports (TPU on the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np


BASELINE_RAYS_PER_S = 1.0e6  # reference GPU throughput (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    from raynet_tpu.ops import fused

    # Aerial-like frame: 360 x 640, 5 views, D=32, F=32, padding 11.
    h, w = 360, 640
    n_views, depth_planes, padding, feat_dim = 5, 32, 11, 32
    rays_batch = 65536
    n_rays = h * w

    rng = np.random.RandomState(0)
    K = np.array(
        [[2300.0, 0, w / 2], [0, 2300.0, h / 2], [0, 0, 1]], dtype=np.float64
    )
    P_list, centers = [], []
    for i in range(n_views):
        ang = (i - n_views / 2) * 0.03
        c = np.array([16.0 * np.sin(ang), 0.0, -16.0 * np.cos(ang)])
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        t = -R @ c.reshape(3, 1)
        P_list.append(K @ np.hstack([R, t]))
        centers.append(c)
    P = jnp.asarray(np.stack(P_list), dtype=jnp.float32)
    P_pinv = jnp.asarray(np.linalg.pinv(P_list[0]), dtype=jnp.float32)
    center = jnp.asarray(centers[0], dtype=jnp.float32)
    bbox = jnp.asarray([-3, -3, -3, 3, 3, 3], dtype=jnp.float32)

    features = jnp.asarray(
        rng.randn(n_views, h + padding + 1, w + padding + 1, feat_dim),
        dtype=jnp.float32,
    )

    def sweep_image():
        depths = []
        for off in range(0, n_rays, rays_batch):
            idxs = jnp.arange(off, off + rays_batch, dtype=jnp.int32) % n_rays
            _, depth = fused.mvcnn_depth_step(
                idxs, features, P, P_pinv, center, bbox,
                h, w, padding, depth_planes,
            )
            depths.append(depth)
        return depths[-1]

    # Warmup (compile)
    sweep_image().block_until_ready()

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = sweep_image()
    out.block_until_ready()
    elapsed = (time.perf_counter() - t0) / iters

    n_processed = ((n_rays + rays_batch - 1) // rays_batch) * rays_batch
    rays_per_s = n_processed / elapsed

    print(
        json.dumps(
            {
                "metric": "plane_sweep_rays_per_second",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
