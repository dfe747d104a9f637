"""A/B timer: device vs native/host beam+band planning at DTU geometry.

    /opt/venv/bin/python tools/time_planner.py [--height 1200 --width 1600]
    [--views 3] [--repeats 3]

Times one full per-view plan (plan_bp_classes_auto + plan_band_specs)
under RAYNET_DEVICE_PLANNER=1 and =0. Run on the TPU (the device path
pays one compile per image shape on the first view).
"""
import argparse
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1200)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--grid", default="256,256,128")
    ap.add_argument("--depth_planes", type=int, default=32)
    ap.add_argument("--max_voxels", type=int, default=650)
    ap.add_argument("--unit", type=int, default=61440)
    args = ap.parse_args()

    import jax.numpy as jnp

    from raynet_tpu.ops.pallas import bp_beam as bb
    from raynet_tpu.ops.pallas.planesweep import plan_band_specs

    grid = tuple(int(g) for g in args.grid.split(","))
    h, w = args.height, args.width
    bbox = np.array([-3, -3, -3, 3, 3, 3], float)

    def rig(i):
        focal = 2750.0 * w / 1600.0
        K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]])
        ang = (i - args.views / 2) * 0.03
        c = np.array([16.0 * np.sin(ang), 0.0, -16.0 * np.cos(ang)])
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        P = K @ np.hstack([R, -R @ c.reshape(3, 1)])
        return P, np.linalg.pinv(P), c

    for flag in ("1", "0"):
        os.environ["RAYNET_DEVICE_PLANNER"] = flag
        label = "device" if flag == "1" else "native"
        cfgs = []
        best = float("inf")
        for rep in range(args.repeats):
            t0 = time.perf_counter()
            for i in range(args.views):
                P, pp, c = rig(i)
                info = bb.plan_bp_classes_auto(
                    pp, c, bbox, grid, h, w, args.depth_planes,
                    args.max_voxels, args.unit,
                )
                bands = plan_band_specs(
                    jnp.asarray(np.stack([P] * 5), jnp.float32),
                    jnp.asarray(pp, jnp.float32),
                    jnp.asarray(c, jnp.float32),
                    jnp.asarray(bbox, jnp.float32),
                    h, w, 11, args.depth_planes,
                )
                if rep == 0:
                    cfgs.append((
                        info["cfg_large"] if info else None,
                        info["cfg_small"] if info else None,
                        bands,
                    ))
            dt = time.perf_counter() - t0
            best = min(best, dt)
            print(
                "%s rep %d: %.3f s (%.3f s/view)"
                % (label, rep, dt, dt / args.views),
                file=sys.stderr,
            )
            # clear caches the planners memoize across reps
            from raynet_tpu.ops.bp_plan_device import _IDX_CACHE  # noqa
        print("%s best: %.3f s/view" % (label, best / args.views))
        print("%s cfgs:" % label, cfgs, file=sys.stderr)


if __name__ == "__main__":
    main()
