"""North-star tracker: synthetic full-scene RayNet reconstruction wall-clock.

BASELINE.md's target: one full DTU scene (MVCNN + 3 BP iterations, paper
resolution) in < 60 s on a single v5e chip. This script reconstructs a
synthetic scene of configurable size through the real orchestration path
(RayNetForwardPass: cached CNN features, pallas traversal, fused message
steps, global accumulator) and reports seconds/scene plus the extrapolated
full-DTU estimate. Not driver-run (bench.py is the one-line benchmark);
meant for tracking progress across rounds:

    /opt/venv/bin/python bench_scene.py [--images 4] [--height 180] ...
"""
import argparse
import json
import sys
import time

import numpy as np


def run_scene_benchmark(
    images=4, height=180, width=320, depth_planes=32,
    grid=(128, 128, 64), max_voxels=384, rays_batch=65536, focal=400.0,
    filter_rays=False, host_staged=False, scan_dir=None, scan_format=None,
    profile=False, repeats=5, measure_cold=True,
    messages_device_budget=None,
):
    """Build a synthetic ring scene — or load a REAL scan directory when
    ``scan_dir`` is given (VERDICT r2: real-data validation hook;
    ``scan_format`` "restrepo" or "dtu", default by layout sniffing) —
    and reconstruct it through the REAL orchestration path
    (RayNetForwardPass). Returns the metrics dict."""
    import types

    args = types.SimpleNamespace(
        images=images, height=height, width=width,
        depth_planes=depth_planes, grid=grid, max_voxels=max_voxels,
        rays_batch=rays_batch,
    )

    import imageio.v2 as imageio
    import tempfile, os

    # NOTE: do NOT import tests/conftest here — importing it force-selects
    # the CPU backend with 8 virtual devices as a side effect.
    def _make_ring_camera(angle, h, w, radius=20.0):
        K = np.array(
            [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
            dtype=np.float32,
        )
        c = np.array([radius * np.sin(angle), 0.0, -radius * np.cos(angle)])
        z = -c / np.linalg.norm(c)
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z]).astype(np.float32)
        t = (-R @ c.reshape(3, 1)).astype(np.float32)
        return K, R, t

    from raynet_tpu.common.scene import RestrepoScene
    from raynet_tpu.common.generation_parameters import GenerationParameters
    from raynet_tpu.common.sampling_schemes import get_sampling_scheme
    from raynet_tpu.inference import get_forward_pass_factory
    from raynet_tpu.models.feature_extractor import FeatureExtractor
    import jax.numpy as jnp

    h, w = args.height, args.width
    root = None
    if scan_dir is None:
        root = tempfile.mkdtemp(prefix="bench_scene_")
    if scan_dir is None:
        os.makedirs(root + "/imgs")
        os.makedirs(root + "/cams_krt")
        rng = np.random.RandomState(0)
        for i in range(args.images + 4):
            imageio.imwrite(
                root + "/imgs/frame%05d.png" % (i + 1,),
                (rng.rand(h, w, 3) * 255).astype(np.uint8),
            )
            K, R, t = _make_ring_camera((i - args.images / 2) * 0.04, h, w)
            rows = (
                [" ".join("%.9g" % v for v in row) for row in K]
                + [" ".join("%.9g" % v for v in row) for row in R]
                + [" ".join("%.9g" % v for v in t.ravel())]
            )
            open(root + "/cams_krt/frame%05d_cam.txt" % (i + 1,), "w").write(
                "\n".join(rows) + "\n"
            )
        open(root + "/scene_info.xml", "w").write(
            '<?xml version="1.0"?>\n<info>\n'
            '  <bbox minx="-3" miny="-3" minz="-3" maxx="3" maxy="3" maxz="3"/>\n'
            "</info>\n"
        )
        if filter_rays:
            # GT quad at z=0 covering the bbox footprint: like DTU's
            # ObsMask/GT filter, only rays with ground truth are predicted
            open(root + "/gt_mesh.obj", "w").write(
                "v -3 -3 0\nv 3 -3 0\nv 3 3 0\nv -3 3 0\n"
                "vn 0 0 -1\nvn 0 0 -1\nvn 0 0 -1\nvn 0 0 -1\n"
                "f 1//1 2//2 3//3\nf 1//1 3//3 4//4\n"
            )

    if scan_dir is not None:
        import os as _os

        fmt = scan_format
        if fmt is None:
            fmt = (
                "restrepo"
                if _os.path.isdir(_os.path.join(scan_dir, "cams_krt"))
                else "dtu"
            )
        if fmt == "restrepo":
            scene = RestrepoScene(scan_dir)
        else:
            from raynet_tpu.common.scene import DTUScene

            scene = DTUScene(scan_dir)
        root = scan_dir
        h, w = scene.image_shape
        args.images = min(images, scene.n_images)
    else:
        scene = RestrepoScene(root)
    gp = GenerationParameters(
        depth_planes=args.depth_planes,
        neighbors=4,
        patch_shape=(11, 11, 3),
        grid_shape=np.array(args.grid, dtype=np.int32),
        max_number_of_marched_voxels=args.max_voxels,
        padding=11,
        gamma_mrf=0.05,
    )
    model = FeatureExtractor("simple_cnn", output_dtype=jnp.bfloat16)
    fp = get_forward_pass_factory("raynet")(
        model, gp, get_sampling_scheme("sample_in_bbox")(gp),
        scene.image_shape, args.rays_batch, filter_out_rays=filter_rays,
    )
    if messages_device_budget is not None:
        # paper-resolution runs: 2 views of beam-slot messages are
        # ~5.9 GB — over the conservative 4 GB class default but well
        # inside a v5e's 16 GB HBM; without this the bench silently
        # flips to the host-staged path and measures the tunnel
        fp.messages_device_budget = messages_device_budget
    if host_staged:
        # force the full-DTU single-chip storage plan: per-(image, sweep)
        # f16 store staging through the device around the fused scan
        fp.messages_device_budget = 0
        fp.force_host_staging = True

    # warmup (compiles) over the SAME image range: the scene-level plan
    # coalescing makes the static configs depend on the image set
    _ = list(fp.forward_pass(scene, (0, args.images, 1)))

    if profile:
        # One profiled pass with per-phase device syncs: attributes wall
        # time to msg sweeps / depth sweep / downloads. Syncs break the
        # dispatch pipelining, so this pass's total EXCEEDS the honest
        # timed runs below — attribution only. Runs against a FRESH
        # timer so the sync-inflated numbers never contaminate the
        # honest 'phase totals' printed after the timed runs; the cold
        # orchestration-plan time was recorded during warmup, so carry
        # that attribution over explicitly.
        from raynet_tpu.utils.profiling import PhaseTimer

        warm_timer, fp.timer = fp.timer, PhaseTimer(verbose=False)
        cold_plan = warm_timer.totals.get("Orchestration plan (cold)")
        fp.profile_sync = True
        t0 = time.perf_counter()
        _ = list(fp.forward_pass(scene, (0, args.images, 1)))
        prof_total = time.perf_counter() - t0
        fp.profile_sync = False
        phases = {
            k: round(v["total_s"], 3)
            for k, v in sorted(fp.timer.summary().items())
        }
        if cold_plan is not None:
            phases["Orchestration plan (cold, warmup)"] = round(
                cold_plan, 3
            )
        fp.timer = warm_timer
        print(
            "profiled pass: %.3f s; phases:" % prof_total,
            json.dumps(phases),
            file=sys.stderr,
        )

    # best-of-N (default 5): axon tunnel dispatch latency adds a one-sided
    # ~20% run-to-run spread; the minimum is the honest device-limited
    # number. Callers on a tight wall-clock budget pass repeats=2-3.
    elapsed = float("inf")
    staged_bytes = 0
    for _ in range(max(repeats, 1)):
        fp.staged_bytes = 0
        t0 = time.perf_counter()
        maps = list(fp.forward_pass(scene, (0, args.images, 1)))
        elapsed = min(elapsed, time.perf_counter() - t0)
        staged_bytes = fp.staged_bytes  # equal every run

    # Cold CNN-feature phase, measured separately: the best-of-N loop
    # above runs with a warm per-scene feature cache (legitimate within
    # one scene pass — each of DTU's 49 view sets is computed once), so
    # the ray-pipeline number excludes it. A real 49-image scan computes
    # 49 view sets; extrapolate that cost from an explicit cold re-prime.
    # NOTE: on this platform the image upload rides the slow axon tunnel,
    # so this is an upper bound vs a local PCIe host.
    # measure_cold=False skips the re-prime loops (callers on a budget
    # that only need the warm orchestrated number).
    feat_s = float("inf")
    for _ in range(2 if measure_cold else 0):
        fp._feature_cache.clear()
        fp._image_feature_cache.clear()
        t0 = time.perf_counter()
        for i in range(args.images):
            fp._features_and_cameras(scene, i)
        last = fp._feature_cache[args.images - 1][0]
        float(jnp.sum(last.astype(jnp.float32)))  # device sync
        feat_s = min(feat_s, time.perf_counter() - t0)
    # Per-image feature dedup makes the cost scale with UNIQUE images
    # (sets + neighbors on a sequential scan), not sets x views. Report
    # the reference-comparable per-view-set cost and extrapolate the
    # DTU feature phase over its ~(49 + neighbors) unique images.
    uniq = len(
        {
            j
            for i in range(args.images)
            for j in scene.get_view_idxs(i, gp.neighbors)
        }
    )
    feat_per_image = feat_s / max(uniq, 1)
    feat_per_set = (gp.neighbors + 1) * feat_per_image
    dtu_unique_images = 49 + gp.neighbors

    # Cold orchestration-plan cost (beam/band planning + ray argsorts +
    # chunk commits). The value recorded during the WARMUP pass is
    # contaminated by one-time jit compiles (30-150 s each on the
    # remote compiler) and first-dispatch inflation — measured 24 s/view
    # at warmup vs 2.7 s/view re-primed at 720p. A real 49-view scene
    # pays the compile once and the PLAN per view, so extrapolate from
    # an explicit re-prime: clear every per-view plan cache (band specs,
    # beam cfg/classes, orch plan) while jit + feature caches stay warm.
    plan_warmup_s = fp.timer.totals.get("Orchestration plan (cold)", 0.0)
    plan_s = float("inf")
    for _ in range(2 if measure_cold else 0):
        fp._band_cache.clear()
        for name in ("_bp_cfg_cache", "_bp_class_cache", "_orch_cache"):
            if hasattr(fp, name):
                getattr(fp, name).clear()
        before = fp.timer.totals.get("Orchestration plan (cold)", 0.0)
        _ = list(fp.forward_pass(scene, (0, args.images, 1)))
        after = fp.timer.totals.get("Orchestration plan (cold)", 0.0)
        plan_s = min(plan_s, after - before)
    # the re-prime left warm caches in place for any later passes

    rays_full = args.images * h * w
    valid = (
        sum(
            len(fp.get_valid_rays_per_image(scene, i))
            for i in range(args.images)
        )
        if filter_rays
        else rays_full
    )
    sweeps = 4  # 3 BP iterations + depth sweep
    dtu_rays = 49 * 1600 * 1200
    # with filtering: "a DTU scene whose GT mask keeps the same fraction"
    est_dtu = elapsed / rays_full * dtu_rays

    print("phase totals:", fp.timer.summary(), file=sys.stderr)
    assert all(np.isfinite(m).all() for m in maps)
    out = {
        "metric": "raynet_scene_seconds",
        "images": args.images,
        "rays": valid,
        "valid_fraction": round(valid / rays_full, 3),
        "value": round(elapsed, 2),
        "rays_per_second_full_pipeline": round(
            valid * sweeps / elapsed, 1
        ),
        "extrapolated_full_dtu_seconds": round(est_dtu, 1),
        "orchestration_plan_warmup_seconds": round(plan_warmup_s, 2),
    }
    if measure_cold:
        out["feature_set_seconds"] = round(feat_per_set, 3)
        out["orchestration_plan_seconds"] = round(plan_s, 2)
        # feature cost scales per UNIQUE image x pixels (53 unique
        # images over DTU's 49 sequential view sets), not per ray;
        # plan cost scales per reference view x rays — both paid once
        # per scene and extrapolated into the cold number
        out["extrapolated_full_dtu_cold_seconds"] = round(
            est_dtu
            + feat_per_image * dtu_unique_images * (1600 * 1200) / (h * w)
            + plan_s / max(args.images, 1)
            * 49 * (1600 * 1200) / (h * w),
            1,
        )
    if staged_bytes:
        out["staged_gbytes"] = round(staged_bytes / 1e9, 3)
    if filter_rays:
        # Scene-level metric path (depth maps -> consistency-filtered
        # pointcloud -> accuracy/completeness vs the GT mesh): guards the
        # full metrics pipeline at scene scale each round (VERDICT r2 #6).
        from raynet_tpu.metrics import Accuracy, Completeness
        from raynet_tpu.pointcloud import get_pointcloud

        dm_files = []
        for i, m in enumerate(maps):
            f = os.path.join(root, "depth_%03d.npy" % i)
            np.save(f, m)
            dm_files.append(f)
        frame_idxs = list(range(args.images))
        pc = get_pointcloud(
            scene, frame_idxs, dm_files, with_consistency=True,
            borders=8, consistency_threshold=0.3, n_neighbors=2,
        )
        acc, _ = Accuracy(borders=8).compute(
            scene, frame_idxs, dm_files, pc
        )
        comp, _ = Completeness(borders=8).compute(
            scene, frame_idxs, dm_files, pc
        )
        out["accuracy_mean_dist"] = round(float(np.mean(acc)), 4)
        out["completeness_mean_dist"] = round(float(np.mean(comp)), 4)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=4)
    p.add_argument("--height", type=int, default=180)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--depth_planes", type=int, default=32)
    p.add_argument("--grid", type=lambda s: tuple(map(int, s.split(","))),
                   default="128,128,64")
    p.add_argument("--max_voxels", type=int, default=384)
    p.add_argument("--rays_batch", type=int, default=65536)
    # DTU cameras are ~2.2x the image width in focal length; the default
    # 400 keeps historical comparability of the 180x320 tracking number
    p.add_argument("--focal", type=float, default=400.0)
    p.add_argument("--filter", action="store_true",
                   help="GT-mask the rays (DTU filter_out_rays analog)")
    p.add_argument("--host_staged", action="store_true",
                   help="force the f16 host-staged message store path")
    p.add_argument("--profile", action="store_true",
                   help="run one pass with per-phase device syncs and "
                        "print the attribution (see profile_sync)")
    p.add_argument("--scan_dir", default=None,
                   help="REAL scan directory (Restrepo imgs/cams_krt or "
                        "DTU scan layout) instead of the synthetic scene")
    p.add_argument("--scan_format", default=None,
                   choices=(None, "restrepo", "dtu"),
                   help="force the scan layout (default: sniff)")
    a = p.parse_args()
    print(json.dumps(run_scene_benchmark(
        a.images, a.height, a.width, a.depth_planes, tuple(a.grid),
        a.max_voxels, a.rays_batch, a.focal, a.filter, a.host_staged,
        a.scan_dir, a.scan_format, a.profile,
    )))


if __name__ == "__main__":
    main()
