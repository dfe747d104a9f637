"""Host-side cold-plan profiler: where does a 720p view's planning go?

Runs the native/numpy planning path only (no device, no jit) so it can
be profiled on any host regardless of tunnel health. The cold-scene
headline is plan-dominated after the fused-candidate rewrite
(docs/performance.md round-4 table: plan:bp_classes ~0.18 s/view,
plan:band_specs ~0.1 s/view at 720p); this tool attributes the
remaining host time inside those buckets.

Usage: /opt/venv/bin/python tools/profile_plan.py [--views 4] [--cprofile]
"""
import argparse
import cProfile
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _rig(h, w, azim, elev, focal=2200.0):
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]])
    c = 16.0 * np.array(
        [
            np.cos(elev) * np.sin(azim),
            np.sin(elev),
            -np.cos(elev) * np.cos(azim),
        ]
    )
    z = -c / np.linalg.norm(c)
    x = np.cross([0, 1, 0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    P = K @ np.hstack([R, -R @ c.reshape(3, 1)])
    return P, np.linalg.pinv(P), c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--depth_planes", type=int, default=32)
    ap.add_argument("--rays_batch", type=int, default=61440)
    ap.add_argument("--cprofile", action="store_true")
    args = ap.parse_args()

    from raynet_tpu.ops.pallas.bp_beam import plan_bp_classes_auto
    from raynet_tpu.ops.pallas.planesweep import plan_band_specs
    from raynet_tpu import native

    print("native:", native.is_available(), file=sys.stderr)
    h, w = args.h, args.w
    grid_shape = (128, 128, 64)
    bbox = np.asarray([-3, -3, -3, 3, 3, 3], float)
    max_voxels = 416

    rigs = [
        _rig(h, w, np.radians(a), np.radians(e))
        for a, e in ((0, 0), (45, 0), (90, 25), (180, 10))
    ][: args.views]

    def run_classes():
        for P, pp, cc in rigs:
            t0 = time.perf_counter()
            info = plan_bp_classes_auto(
                pp, cc, bbox, grid_shape, h, w, args.depth_planes,
                max_voxels, args.rays_batch,
            )
            dt = time.perf_counter() - t0
            print("bp_classes  %.3f s  (cfg %s)" % (
                dt, "ok" if info else "reject"))

    def run_bands():
        for P, pp, cc in rigs:
            t0 = time.perf_counter()
            specs = plan_band_specs(
                np.asarray(P)[None].repeat(5, 0),
                np.asarray(pp), np.asarray(cc), bbox, h, w, 3,
                args.depth_planes,
            )
            dt = time.perf_counter() - t0
            print("band_specs  %.3f s  (%s)" % (dt, specs))

    if args.cprofile:
        pr = cProfile.Profile()
        pr.enable()
        run_classes()
        run_bands()
        pr.disable()
        st = pstats.Stats(pr)
        st.sort_stats("cumulative").print_stats(30)
    else:
        # warm once (numpy/ctypes import, OpenMP pool spin-up)
        run_classes()
        print("--- warm ---")
        run_classes()
        run_bands()
        print("--- warm ---")
        run_bands()


if __name__ == "__main__":
    main()
