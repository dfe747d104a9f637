"""Benchmark: plane-sweep depth-estimation throughput (rays/second).

Reproduces the reference's headline number — the multi_view_cnn CUDA path
scored a sub-megapixel Aerial frame in ~0.065 s, i.e. ~1e6 rays/s of
plane-sweep scoring on a 2016 TITAN X (docs/getting-started.md:119-157,
BASELINE.md). Same pipeline shape here: D=32 depth hypotheses, 5 views,
F=32 features, bbox sampling, argmax depth.

Measurement notes: on the tunneled TPU platform, `block_until_ready` does
not actually synchronize, and closed-over arrays become HLO constants — so
every timed function takes its inputs as arguments and the loop materializes
a device-side scalar reduction per iteration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}; per-stage
details go to stderr.
"""
import json
import sys
import time

import numpy as np


BASELINE_RAYS_PER_S = 1.0e6  # reference GPU throughput (BASELINE.md)


def _cameras(h, w, n_views):
    K = np.array(
        [[2300.0, 0, w / 2], [0, 2300.0, h / 2], [0, 0, 1]], dtype=np.float64
    )
    Ps, centers = [], []
    for i in range(n_views):
        ang = (i - n_views / 2) * 0.03
        c = np.array([16.0 * np.sin(ang), 0.0, -16.0 * np.cos(ang)])
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        t = -R @ c.reshape(3, 1)
        Ps.append(K @ np.hstack([R, t]))
        centers.append(c)
    return np.stack(Ps), np.linalg.pinv(Ps[0]), centers[0]


def main():
    import jax
    import jax.numpy as jnp

    from raynet_tpu.ops import fused

    h, w = 360, 640
    n_views, depth_planes, padding, feat_dim = 5, 32, 11, 32
    rays_batch = 65536
    n_rays = h * w

    rng = np.random.RandomState(0)
    P_np, P_pinv_np, center_np = _cameras(h, w, n_views)
    P = jnp.asarray(P_np, dtype=jnp.float32)
    P_pinv = jnp.asarray(P_pinv_np, dtype=jnp.float32)
    center = jnp.asarray(center_np, dtype=jnp.float32)
    bbox = jnp.asarray([-3, -3, -3, 3, 3, 3], dtype=jnp.float32)
    # bf16 feature maps: standard TPU practice (all post-gather math is f32)
    features = jnp.asarray(
        rng.randn(n_views, h + padding + 1, w + padding + 1, feat_dim),
        dtype=jnp.bfloat16,
    )

    @jax.jit
    def sweep(idxs, features, P, P_pinv, center, bbox):
        _, depth = fused.mvcnn_depth_step(
            idxs, features, P, P_pinv, center, bbox,
            h, w, padding, depth_planes,
        )
        return depth.sum()

    batches = [
        jnp.arange(off, off + rays_batch, dtype=jnp.int32) % n_rays
        for off in range(0, n_rays, rays_batch)
    ]

    def sweep_image():
        acc = 0.0
        for idxs in batches:
            acc += float(sweep(idxs, features, P, P_pinv, center, bbox))
        return acc

    sweep_image()  # warmup/compile
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        sweep_image()
    elapsed = (time.perf_counter() - t0) / iters

    n_processed = len(batches) * rays_batch
    rays_per_s = n_processed / elapsed
    print(
        "plane sweep: %.1f ms / image sweep (%d rays)"
        % (elapsed * 1e3, n_processed),
        file=sys.stderr,
    )

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
