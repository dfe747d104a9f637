"""Benchmark suite: one JSON line per metric (driver captures stdout).

Metrics
-------
1. plane_sweep_rays_per_second — the reference's headline number: the
   multi_view_cnn CUDA path scored a sub-megapixel Aerial frame in ~0.065 s
   = ~1e6 rays/s on a 2016 TITAN X (docs/getting-started.md:119-157,
   BASELINE.md). Served here by the banded Pallas plane-sweep kernel.
2. raynet_message_step_ms — one fused RayNet BP message sweep over 65,536
   rays at production shapes (D=32, V=5, M=650, grid 256x256x128);
   vs_baseline is round 1's 1109 ms.
3. dtu_scene_extrapolated_s — (3 message + 1 depth sweeps) x 49 views x
   1.92M rays extrapolated from the measured per-batch times; vs_baseline
   is the <60 s reference scene target (BASELINE.md).
4. mvcnn_depth_agreement / voxel_depth_agreement — ON-DEVICE value checks:
   the compiled Mosaic kernels (banded plane sweep; DDA traversal) must
   reproduce the XLA paths' depths. Guards against interpreter-vs-Mosaic
   divergence every round; vs_baseline is the 0.999 agreement bar.

Measurement notes: on the tunneled TPU platform, `block_until_ready` does
not actually synchronize, and closed-over arrays become HLO constants — so
every timed function takes its inputs as arguments and the loop materializes
a device-side scalar reduction per iteration.
"""
import json
import os
import sys
import time

import numpy as np


BASELINE_RAYS_PER_S = 1.0e6  # reference GPU throughput (BASELINE.md)
ROUND1_MESSAGE_STEP_MS = 1109.0
DTU_SCENE_TARGET_S = 60.0
AGREEMENT_BAR = 0.999


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


def emit(metric, value, unit, vs_baseline):
    rec = {
        "metric": metric,
        "value": round(float(value), 4),
        "unit": unit,
        "vs_baseline": round(float(vs_baseline), 3),
    }
    # every metric is recorded so main() can re-emit the WHOLE decision
    # set as the final block (VERDICT r4 #2: the driver captures only the
    # stdout tail, and the agreement/correctness lines scrolled out of
    # the round-4 artifact); latest value wins for re-emitted metrics
    EMITTED[metric] = rec
    print(json.dumps(rec))
    sys.stdout.flush()


EMITTED = {}


def emit_final_block(headline_metric):
    """Re-print every recorded metric, headline LAST, so the driver's
    tail always contains the full correctness + performance evidence."""
    print("bench: final metric block", file=sys.stderr)
    ordered = [m for m in EMITTED if m != headline_metric]
    if headline_metric in EMITTED:
        ordered.append(headline_metric)
    for m in ordered:
        print(json.dumps(EMITTED[m]))
    sys.stdout.flush()


def main():
    import subprocess
    import threading

    # Liveness heartbeat for the supervisor: device-probed 2026-08-19,
    # background threads DO run during normal remote compiles (the wait
    # releases the GIL) but NOT during a tunnel wedge (the hung C call
    # holds the GIL) — so silence on this channel means a real wedge,
    # never a long compile.
    def _beat():
        while True:
            time.sleep(60)
            print("bench: alive %.0f s" % (time.perf_counter() - t_hb0,),
                  file=sys.stderr, flush=True)

    t_hb0 = time.perf_counter()
    threading.Thread(target=_beat, daemon=True).start()

    # The tunneled TPU backend can hang indefinitely at first use when the
    # tunnel is down (observed round 3), and the hung C call HOLDS THE GIL
    # — an in-process watchdog thread never gets scheduled. Probe in a
    # SUBPROCESS with a bounded wait and fail fast with a legible error
    # instead of wedging the driver.
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=600, check=True, capture_output=True,
        )
    except subprocess.TimeoutExpired:
        print("bench: backend unreachable after 600 s (tunnel down?)",
              file=sys.stderr)
        sys.exit(1)
    except subprocess.CalledProcessError as e:
        print("bench: backend probe failed:\n%s" % e.stderr.decode()[-2000:],
              file=sys.stderr)
        sys.exit(1)

    import jax
    import jax.numpy as jnp

    from raynet_tpu.ops import fused
    from raynet_tpu.ops.pallas.planesweep import plan_band_specs

    on_tpu = jax.default_backend() != "cpu"

    # Wall-clock budget (VERDICT r3 #1: the r3 run was killed at rc=124
    # with the headline metric still unprinted). Every scene variant
    # checks the remaining budget before starting; the headline
    # orchestrated variant runs FIRST and its metric is re-emitted as the
    # final line so the driver's parsed result is always the headline.
    t_bench0 = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))

    def budget_left():
        return budget_s - (time.perf_counter() - t_bench0)

    # ----------------- 5. full ORCHESTRATED scene (RayNetForwardPass) ----
    # VERDICT r3 #1 ordering: the headline orchestrated variant runs FIRST
    # and emits dtu_scene_orchestrated_s IMMEDIATELY (the r3 run was
    # killed mid-diagnostics with the headline unprinted). Diagnostics
    # (GT-masked, host-staged) run after, each gated on remaining budget;
    # the headline is re-emitted as the FINAL line so the driver's parsed
    # result is the headline whenever it was captured at all.
    if on_tpu:
        from bench_scene import run_scene_benchmark

        # (a) link-bandwidth probe: the host-staged diagnostic is
        # TRANSFER-bound, and on a degraded tunnel (0.036 GB/s observed
        # r3 vs ~0.43 typical) it burns the whole driver budget. One
        # ~32 MB round trip measures the link up front.
        link_gbps = 0.0
        try:
            jax.device_put(np.zeros((1 << 16,), np.uint8))  # warm path
            # ADAPTIVE probe: start at 2 MB — a degraded tunnel has been
            # observed at ~0.01-0.03 GB/s, where the old 32 MB probe
            # alone took tens of minutes of the driver budget. Only
            # confirm with the 32 MB probe when the link looks healthy.
            probe_np = np.zeros((2 << 20,), np.uint8)
            t0 = time.perf_counter()
            dev = jax.device_put(probe_np)
            float(dev[::65536].astype(jnp.float32).sum())  # commit + sync
            up_s = time.perf_counter() - t0
            link_gbps = probe_np.nbytes / up_s / 1e9
            del dev
            if link_gbps >= 0.15:
                probe_np = np.zeros((32 << 20,), np.uint8)
                t0 = time.perf_counter()
                dev = jax.device_put(probe_np)
                float(dev[::65536].astype(jnp.float32).sum())
                up_s = time.perf_counter() - t0
                link_gbps = probe_np.nbytes / up_s / 1e9
                del dev
        except Exception as e:
            print("link probe failed: %r" % (e,), file=sys.stderr)
        emit("link_gb_per_s", round(link_gbps, 3), "GB/s", link_gbps / 0.43)

        headline = None

        # (b) HEADLINE: DTU PAPER RESOLUTION (VERDICT r4 #1 — the 720p
        # run extrapolated by ray count, but band specs, beam-box K/BA
        # needs and tile geometry all depend on image geometry; the
        # headline must come from a native 1600x1200 capture). 2 views
        # at native res; the full-DTU number is then a pure ray-COUNT
        # extrapolation (x24.5 views), no resolution extrapolation.
        # Focal keeps the DTU focal/width ratio used at 720p (2200/1280).
        try:
            res = run_scene_benchmark(
                images=2, height=1200, width=1600, focal=2750.0,
                repeats=(
                    3 if budget_left() > 900 and link_gbps > 0.1 else 2
                ),
                messages_device_budget=8 << 30,
            )
            headline = res["extrapolated_full_dtu_seconds"]
            emit(
                "dtu_scene_orchestrated_s", headline, "s",
                DTU_SCENE_TARGET_S / headline,
            )
            emit(
                "raynet_scene_rays_per_second",
                res["rays_per_second_full_pipeline"], "rays/s",
                res["rays_per_second_full_pipeline"] / BASELINE_RAYS_PER_S,
            )
            # CNN feature computation per 5-view set (reference headline:
            # 0.63-0.70 s on a 2018 TITAN X, getting-started.md:118-157);
            # includes the image upload, which rides the slow tunnel here
            emit(
                "feature_set_s", res["feature_set_seconds"], "s",
                0.65 / max(res["feature_set_seconds"], 1e-9),
            )
            # scene wall-clock INCLUDING 49 cold view-set feature
            # computations (the warm-cache headline amortizes them)
            emit(
                "dtu_scene_cold_features_s",
                res["extrapolated_full_dtu_cold_seconds"], "s",
                DTU_SCENE_TARGET_S
                / res["extrapolated_full_dtu_cold_seconds"],
            )
            # decompose the cold-over-warm gap so the artifact shows
            # which share is device work (plan programs) and which is
            # link-bound transfer (u8 image uploads + CNN dispatches —
            # scale these by link_gb_per_s when judging a degraded-link
            # capture; at 0.43 GB/s the 53 x ~6 MB uploads are ~1 s)
            cold_plan = res.get("orchestration_plan_seconds")
            if cold_plan is not None:
                n_img = res.get("images", 2)
                emit(
                    "dtu_cold_plan_s",
                    round(cold_plan / n_img * 49, 1), "s", 1.0,
                )
                emit(
                    "dtu_cold_feature_s",
                    round(
                        res["extrapolated_full_dtu_cold_seconds"]
                        - headline - cold_plan / n_img * 49, 1,
                    ), "s", 1.0,
                )
        except Exception as e:
            print("scene benchmark failed: %r" % (e,), file=sys.stderr)

        # (b') SECONDARY: the historical 720p point, to validate the
        # ray-count extrapolation across resolutions (the two
        # extrapolated numbers should agree if per-ray cost is truly
        # geometry-independent; their ratio is reported as a check).
        if budget_left() > 420:
            try:
                res720 = run_scene_benchmark(
                    images=2, height=720, width=1280, focal=2200.0,
                    repeats=2, measure_cold=False,
                )
                emit(
                    "dtu_scene_720p_extrapolated_s",
                    res720["extrapolated_full_dtu_seconds"], "s",
                    DTU_SCENE_TARGET_S
                    / res720["extrapolated_full_dtu_seconds"],
                )
                if headline:
                    emit(
                        "resolution_extrapolation_ratio",
                        res720["extrapolated_full_dtu_seconds"] / headline,
                        "x", 1.0,
                    )
            except Exception as e:
                print("720p scene bench failed: %r" % (e,),
                      file=sys.stderr)
        else:
            print("720p variant skipped: %.0f s budget left"
                  % budget_left(), file=sys.stderr)

        # (c) GT-masked variant: only rays with ground truth are
        # predicted (DTU's ObsMask/GT filter keeps ~50-70%); this is how
        # the reference pipeline is actually evaluated. Also carries the
        # scene-scale accuracy/completeness regression guards.
        if budget_left() > 300:
            try:
                res = run_scene_benchmark(
                    images=2, height=720, width=1280, focal=2200.0,
                    filter_rays=True, repeats=2, measure_cold=False,
                )
                if "accuracy_mean_dist" in res:
                    # mean cloud-to-cloud distances on the synthetic
                    # scene (GT is the z=0 quad; bin 0.047 at this grid)
                    emit(
                        "scene_accuracy_mean_dist",
                        res["accuracy_mean_dist"], "world units",
                        res["accuracy_mean_dist"],
                    )
                    emit(
                        "scene_completeness_mean_dist",
                        res["completeness_mean_dist"], "world units",
                        res["completeness_mean_dist"],
                    )
                emit(
                    "dtu_scene_gt_masked_s",
                    res["extrapolated_full_dtu_seconds"], "s",
                    DTU_SCENE_TARGET_S
                    / res["extrapolated_full_dtu_seconds"],
                )
            except Exception as e:
                print("GT-masked scene bench failed: %r" % (e,),
                      file=sys.stderr)
        else:
            print("GT-masked variant skipped: %.0f s budget left"
                  % budget_left(), file=sys.stderr)

        # (d) host-staged variant: the full-DTU SINGLE-CHIP storage story
        # (store exceeds HBM; f16 stage per image-sweep). It is a LINK
        # diagnostic, not a design metric — on a degraded tunnel it took
        # 1334 s of message passing at r3 and killed the run. Skip it
        # unless the link is healthy AND the budget allows.
        if link_gbps >= 0.1 and budget_left() > 300:
            try:
                res_hs = run_scene_benchmark(
                    images=2, height=720, width=1280, focal=2200.0,
                    host_staged=True, repeats=2, measure_cold=False,
                )
                emit(
                    "dtu_scene_host_staged_s",
                    res_hs["extrapolated_full_dtu_seconds"], "s",
                    DTU_SCENE_TARGET_S
                    / res_hs["extrapolated_full_dtu_seconds"],
                )
                if "staged_gbytes" in res_hs and res_hs.get("value"):
                    gbps = res_hs["staged_gbytes"] / res_hs["value"]
                    emit(
                        "host_staged_link_gb_per_s", round(gbps, 3),
                        "GB/s", gbps / 8.0,  # vs ~8 GB/s local PCIe3 x8
                    )
            except Exception as e:
                print("host-staged scene bench failed: %r" % (e,),
                      file=sys.stderr)
        else:
            print(
                "host-staged variant skipped: link %.3f GB/s, %.0f s "
                "budget left" % (link_gbps, budget_left()),
                file=sys.stderr,
            )



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
    # bf16 feature maps: standard TPU practice (all post-gather math is f32).
    # device_put COMMITS the array to the device: on axon a plain
    # jnp.asarray stays host-backed and is re-shipped on every dispatch
    # (~70 ms per call for this ~30 MB array — measured round 2).
    features = jax.device_put(
        np.asarray(
            rng.randn(n_views, h + padding + 1, w + padding + 1, feat_dim),
            dtype=np.float32,
        ).astype(jnp.bfloat16)
    )

    bands = (
        plan_band_specs(
            P, P_pinv, center, bbox, h, w, padding, depth_planes
        )
        if on_tpu
        else None
    )
    print("band specs:", bands, file=sys.stderr)

    # ---------------------------------------------- 1. plane sweep headline
    @jax.jit
    def sweep(idxs, features, P, P_pinv, center, bbox):
        _, depth = fused.mvcnn_depth_step(
            idxs, features, P, P_pinv, center, bbox,
            h, w, padding, depth_planes, band_specs=bands,
            tile_ordered=True,
        )
        return depth.sum()

    # Chunk the TILE-ORDERED ray list so every 128-ray kernel block is one
    # complete pixel tile (mixed-tile blocks blow up the band boxes and
    # trip the exactness fallback). The sweep runs the WHOLE image in one
    # launch when the ray count allows it — per-call overhead through the
    # axon tunnel is several ms.
    xs = np.arange(n_rays) // h
    ys = np.arange(n_rays) % h
    tile_ids = (xs // 16) * ((h + 7) // 8) + ys // 8
    order = np.argsort(tile_ids, kind="stable").astype(np.int32)
    # 65k launches: the exactness cond keeps BOTH the banded and the XLA
    # fallback branches' buffers alive, and the fallback's (N, D, V, F)
    # gather intermediates blow HBM at larger launches.
    sweep_batch = rays_batch
    batches = [
        jnp.asarray(
            order[np.arange(off, off + sweep_batch) % n_rays]
        )
        for off in range(0, n_rays, sweep_batch)
    ]

    def sweep_images(n):
        # Queue ALL batches of n image sweeps asynchronously; ONE device
        # sync at the end (each float() costs a ~40 ms tunnel round trip).
        sums = [
            sweep(idxs, features, P, P_pinv, center, bbox)
            for _ in range(n)
            for idxs in batches
        ]
        return float(jnp.stack(sums).sum())

    sweep_images(1)  # warmup/compile
    sweep_images(2)  # warm-in: the FIRST timed workload of a process
    # measures ~80 ms/call inflated on axon even after its own warmup
    iters = 4
    best = float("inf")
    for _ in range(3):  # best-of-3 against tunnel latency variance
        t0 = time.perf_counter()
        sweep_images(iters)
        best = min(best, time.perf_counter() - t0)
    elapsed = best / iters

    n_processed = len(batches) * rays_batch
    rays_per_s = n_processed / elapsed
    print(
        "plane sweep: %.1f ms / image sweep (%d rays)"
        % (elapsed * 1e3, n_processed),
        file=sys.stderr,
    )
    emit(
        "plane_sweep_rays_per_second", round(rays_per_s, 1), "rays/s",
        rays_per_s / BASELINE_RAYS_PER_S,
    )

    # ------------------------------- 2./3. full RayNet message sweep + DTU
    grid_shape = (256, 256, 128)
    max_voxels = 650
    grid_size = int(np.prod(grid_shape))
    grid_acc = jnp.full((grid_size,), -3.0, dtype=jnp.float32)

    bp_cfg = None
    if on_tpu:
        from raynet_tpu.ops.pallas.bp_beam import plan_bp_config_auto

        bp_cfg = plan_bp_config_auto(
            P_pinv_np, center_np, np.asarray([-3, -3, -3, 3, 3, 3], float),
            grid_shape, h, w, depth_planes, max_voxels, rays_batch,
            gamma=0.05,
        )
    print("bp beam config:", bp_cfg, file=sys.stderr)

    if bp_cfg is not None:
        msgs = jnp.zeros((rays_batch, bp_cfg.slots), dtype=jnp.float32)

        @jax.jit
        def message_step(idxs, features, P, P_pinv, center, bbox, msgs,
                         acc):
            # strict bands like the production scan path: the lax.cond
            # fallback otherwise keeps an ~8 GB XLA-branch temp alive
            new_msgs, scatter, _, _ = fused.raynet_beam_message_step(
                idxs, features, P, P_pinv, center, bbox, msgs, acc,
                jnp.int32(rays_batch), h, w, padding, depth_planes,
                bp_cfg, band_specs=bands, strict_bands=True,
            )
            return new_msgs.sum() + scatter.sum()
    else:
        msgs = jnp.zeros((rays_batch, max_voxels), dtype=jnp.float32)

        @jax.jit
        def message_step(idxs, features, P, P_pinv, center, bbox, msgs,
                         acc):
            new_msgs, scatter, _ = fused.raynet_message_step(
                idxs, features, P, P_pinv, center, bbox, msgs, acc,
                jnp.int32(rays_batch), h, w, padding, depth_planes,
                grid_shape, max_voxels,
                use_pallas=on_tpu, band_specs=bands, tile_ordered=True,
            )
            return new_msgs.sum() + scatter.sum()

    msg_idxs = jax.device_put(order[:rays_batch].copy())
    args = (msg_idxs, features, P, P_pinv, center, bbox, msgs, grid_acc)

    def msg_iters(n):
        # queue n async steps, ONE sync: a per-call float() costs a full
        # ~40 ms tunnel round trip on axon and masks the device time
        outs = [message_step(*args) for _ in range(n)]
        return float(jnp.stack(outs).sum())

    msg_iters(2)  # warmup/compile
    msg_n = 10
    msg_ms = float("inf")
    for _ in range(3):  # best-of-3 against tunnel latency variance
        t0 = time.perf_counter()
        msg_iters(msg_n)
        msg_ms = min(msg_ms, (time.perf_counter() - t0) / msg_n * 1e3)
    print("raynet message step: %.1f ms / 65k rays" % msg_ms, file=sys.stderr)
    emit(
        "raynet_message_step_ms", msg_ms, "ms",
        ROUND1_MESSAGE_STEP_MS / msg_ms,
    )

    # Single-step extrapolation (message kernel x sweep count only; no
    # features/planning/downloads). Named for what it is — the honest
    # end-to-end number is dtu_scene_orchestrated_s below (VERDICT r3
    # weak #7: two "DTU seconds" metrics that disagree by construction).
    dtu_batches = 49 * 1600 * 1200 / rays_batch
    dtu_s = 4 * (msg_ms / 1e3) * dtu_batches
    emit(
        "message_step_extrapolated_s", dtu_s, "s", DTU_SCENE_TARGET_S / dtu_s
    )

    # -------------------------- 4. on-device kernel-vs-XLA value agreement
    val_idxs = jnp.asarray(order[:4096].copy())  # 32 complete tiles

    @jax.jit
    def depth_banded(idxs, features, P, P_pinv, center, bbox):
        return fused.mvcnn_depth_step(
            idxs, features, P, P_pinv, center, bbox,
            h, w, padding, depth_planes, band_specs=bands,
            tile_ordered=True,
        )[1]

    @jax.jit
    def depth_xla(idxs, features, P, P_pinv, center, bbox):
        return fused.mvcnn_depth_step(
            idxs, features, P, P_pinv, center, bbox,
            h, w, padding, depth_planes,
        )[1]

    d_k = np.asarray(depth_banded(val_idxs, features, P, P_pinv, center, bbox))
    d_x = np.asarray(depth_xla(val_idxs, features, P, P_pinv, center, bbox))
    agree = float(np.isclose(d_k, d_x, rtol=1e-3, atol=1e-3).mean())
    emit("mvcnn_depth_agreement", agree, "fraction", agree / AGREEMENT_BAR)

    vgrid, vm = (128, 128, 64), 384

    @jax.jit
    def vdepth_pallas(idxs, features, P, P_pinv, center, bbox):
        return fused.mvcnn_voxel_depth_step(
            idxs, features, P, P_pinv, center, bbox,
            h, w, padding, depth_planes, vgrid, vm, use_pallas=on_tpu,
        )[3]

    @jax.jit
    def vdepth_scan(idxs, features, P, P_pinv, center, bbox):
        return fused.mvcnn_voxel_depth_step(
            idxs, features, P, P_pinv, center, bbox,
            h, w, padding, depth_planes, vgrid, vm, use_pallas=False,
        )[3]

    v_p = np.asarray(
        vdepth_pallas(val_idxs, features, P, P_pinv, center, bbox)
    )
    v_s = np.asarray(vdepth_scan(val_idxs, features, P, P_pinv, center, bbox))
    vagree = float(np.isclose(v_p, v_s, rtol=1e-3, atol=1e-3).mean())
    emit("voxel_depth_agreement", vagree, "fraction", vagree / AGREEMENT_BAR)

    # --------------- 4a'. MVCNN pretrain epoch (reference headline) ------
    if budget_left() > 180:
        # The reference's getting-started transcript: 500 steps x batch 32
        # (simple_cnn siamese, D=32 planes, 5 views, 11x11x3 patches) in
        # 66-69 s on a 2018 TITAN X (BASELINE.md row 1). Same shapes here.
        from raynet_tpu.train.pretrain import (
            create_pretrain_state, make_pretrain_step,
        )

        b, d_tr, n_tr = 32, 32, 5
        model_tr, state_tr, loss_fn_tr, wd_tr = create_pretrain_state(
            jax.random.PRNGKey(0), (d_tr, n_tr, 11, 11, 3)
        )
        train_step, _ = make_pretrain_step(model_tr, loss_fn_tr, wd_tr)
        x1 = jax.device_put(
            np.asarray(rng.rand(b, d_tr, n_tr, 11, 11, 3), np.float32)
        )
        x2 = jax.device_put(
            np.asarray(rng.rand(b, d_tr, n_tr, 11, 11, 3), np.float32)
        )
        y_tr = np.zeros((b, d_tr), np.float32)
        y_tr[np.arange(b), rng.randint(0, d_tr, b)] = 1.0
        y_tr = jax.device_put(y_tr)

        def steps(n, st):
            # chained states keep every dispatch's args device-committed;
            # ONE sync on the summed losses
            losses = []
            for _ in range(n):
                st, m = train_step(st, x1, x2, y_tr)
                losses.append(m["loss"])
            return st, float(jnp.stack(losses).sum())

        state_tr, _ = steps(2, state_tr)  # warmup/compile
        state_tr, _ = steps(5, state_tr)  # warm-in
        step_s = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state_tr, _ = steps(20, state_tr)
            step_s = min(step_s, (time.perf_counter() - t0) / 20)
        emit(
            "pretrain_epoch_s", 500 * step_s, "s",
            66.0 / (500 * step_s),  # reference: 66-69 s/epoch
        )

    else:
        print("pretrain-epoch section skipped: %.0f s budget left"
              % budget_left(), file=sys.stderr)

    # ------------------- 4b. beam planner acceptance over camera rigs ----
    # Acceptance is a planner-LOGIC metric (path-parity is unit-
    # tested); force the NATIVE planner so 44 rigs don't ride a
    # possibly-degraded tunnel, and gate on remaining budget.
    if budget_left() > 120:
        _prev_dp = os.environ.get("RAYNET_DEVICE_PLANNER")
        os.environ["RAYNET_DEVICE_PLANNER"] = "0"
        try:
            # VERDICT r3: fraction of synthetic rigs (ring/oblique/elevated/
            # mirrored, DTU-like radii+focals) the per-block class planner covers
            # with exact beam configs; rejected rigs fall back to the XLA path.
            from raynet_tpu.ops.pallas.bp_beam import plan_bp_classes_auto

            def _rig(azim, elev, focal):
                Kr = np.array(
                    [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]]
                )
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
                return (
                    np.linalg.pinv(Kr @ np.hstack([R, -R @ c.reshape(3, 1)])), c
                )

            def _plans(pp, cc):
                # production behavior: any rays-per-block candidate planning
                # counts as accepted (the orchestrator picks among them)
                return (
                    plan_bp_classes_auto(
                        pp, cc, np.asarray([-3, -3, -3, 3, 3, 3], float),
                        grid_shape, h, w, depth_planes, max_voxels, rays_batch,
                    )
                    is not None
                )

            acc = tot = 0
            # diagonal azimuths included: dominant-axis-ambiguous viewing is the
            # historical k-cap/ba-cap failure mode (round-3 dense sweep: 44/44)
            for azim_d in (0, 45, 90, 135, 180, 225, 270, 315):
                for elev_d in (0, 25):
                    pp, cc = _rig(
                        np.radians(azim_d), np.radians(elev_d), 2200.0
                    )
                    tot += 1
                    acc += _plans(pp, cc)
            emit("planner_acceptance", acc / tot, "fraction", acc / tot)

            # The DOCUMENTED rejection class, counted explicitly (VERDICT r3 #7:
            # the supported-rig sweep above is structurally un-failable for this
            # hole). Wide-FOV cameras near/inside the bbox (radius < ~1.3x the
            # bbox half-diagonal) reject by design and fall back to the XLA
            # path; planner_fallback_share is the rejecting fraction of the
            # COMBINED sweep — it regresses UP if the hole widens and moves
            # toward 0 if the planner learns these rigs.
            hole = hole_tot = 0
            # focal 250 at w=640 is a ~104-deg FOV: rays from an inside-bbox
            # camera exit the box along BOTH dominant-axis signs
            # (mixed-dominant-sign) — the class the planner rejects by design
            for radius, focal in ((1.0, 250.0), (1.5, 250.0), (2.0, 300.0)):
                for azim_d in (0, 45, 90):
                    Kr = np.array(
                        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]]
                    )
                    az = np.radians(azim_d)
                    cc = radius * np.array([np.sin(az), 0.2, -np.cos(az)])
                    z = -cc / np.linalg.norm(cc)
                    x_ = np.cross([0, 1, 0], z)
                    x_ /= np.linalg.norm(x_)
                    y_ = np.cross(z, x_)
                    Rr = np.stack([x_, y_, z])
                    pp = np.linalg.pinv(
                        Kr @ np.hstack([Rr, -Rr @ cc.reshape(3, 1)])
                    )
                    hole_tot += 1
                    hole += not _plans(pp, cc)
            fallback_share = (hole + (tot - acc)) / (tot + hole_tot)
            emit(
                "planner_fallback_share", fallback_share, "fraction",
                1.0 - fallback_share,
            )

        finally:
            if _prev_dp is None:
                os.environ.pop("RAYNET_DEVICE_PLANNER", None)
            else:
                os.environ["RAYNET_DEVICE_PLANNER"] = _prev_dp
    else:
        print("planner-acceptance section skipped: %.0f s budget left"
              % budget_left(), file=sys.stderr)

    # --------------- 4a''. training QUALITY (VERDICT r4 #6) --------------
    # The reference reaches val_acc 0.58-0.65 / val_mde 1.1-1.5 within
    # <=40 epochs of raynet_pretrain (getting-started.md:58-86; metric
    # definitions models.py:77-87). No dataset ships here, so the analog
    # trains the same pipeline on the textured-quad mock scene: samples
    # via DefaultSampleGenerator/BatchProvider, epochs over a device-
    # committed set, val metrics from the same eval_step.
    if budget_left() > 300:
        try:
            from tools.bench_training_quality import (
                e2e_quality, pretrain_quality,
            )

            q = pretrain_quality(steps=2000, n_train=1024, n_val=256)
            emit(
                "pretrain_val_acc", q["val_acc"], "fraction",
                q["val_acc"] / 0.58,
            )
            emit(
                "pretrain_val_mde", q["val_mde"], "planes",
                1.5 / max(q["val_mde"], 1e-9),
            )
            e2e = e2e_quality()
            # loss decreased (ratio < 1) and the trainable clipped gamma
            # moved off its 0.031 init (the e2e graph trains end to end)
            emit(
                "e2e_train_loss_ratio",
                e2e["loss_last"] / max(e2e["loss_first"], 1e-9), "x",
                e2e["loss_first"] / max(e2e["loss_last"], 1e-9),
            )
            emit(
                "e2e_gamma_moved", e2e["gamma_delta"], "abs",
                1.0 if e2e["gamma_delta"] > 1e-4 else 0.0,
            )
        except Exception as e:
            print("training-quality bench failed: %r" % (e,),
                  file=sys.stderr)
    else:
        print("training-quality bench skipped: %.0f s budget left"
              % budget_left(), file=sys.stderr)
    # Final block: re-emit EVERY captured metric, headline last (the
    # driver parses the last line and records only the tail — the whole
    # correctness evidence must live there, VERDICT r4 #2).
    emit_final_block("dtu_scene_orchestrated_s")


def supervise():
    """Run main() in a child process and restart it once if it stalls.

    The tunneled backend can wedge INSIDE a device call (observed
    2026-08-19: a bench run sat 20+ min in a futex wait before its
    first metric while fresh processes used the device fine). The hung
    C call holds the GIL, so no in-process watchdog can fire — the
    only recovery is killing the process. The supervisor streams the
    child's output through and, if NO new output appears for
    BENCH_STALL_S (default 300 s; the child heartbeats its liveness to
    stderr every 60 s, through compiles too), kills and relaunches it
    once with the remaining wall budget. Metrics emitted before the
    stall are already on stdout; the relaunched child re-emits
    everything, and the headline is re-emitted last either way.
    """
    import subprocess
    import threading

    # the child heartbeats every 60 s through any legit wait (compiles
    # release the GIL; a wedge holds it), so 300 s of TOTAL silence is
    # a wedge, not a slow phase
    stall_s = float(os.environ.get("BENCH_STALL_S", "300"))
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    t0 = time.monotonic()
    for attempt in range(2):
        # the relaunched child gets only the REMAINING wall budget, so a
        # stall + retry never exceeds the driver's original allowance
        env = dict(
            os.environ, RAYNET_BENCH_CHILD="1", PYTHONUNBUFFERED="1",
            BENCH_BUDGET_S=str(max(budget_s - (time.monotonic() - t0), 60)),
        )
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        last_out = [time.monotonic()]

        def pump(src, dst):
            # keep the streams separate: the driver parses STDOUT as
            # JSON metric lines; heartbeats/diagnostics stay on stderr
            for line in src:
                dst.buffer.write(line)
                dst.flush()
                last_out[0] = time.monotonic()

        threads = [
            threading.Thread(
                target=pump, args=(child.stdout, sys.stdout), daemon=True
            ),
            threading.Thread(
                target=pump, args=(child.stderr, sys.stderr), daemon=True
            ),
        ]
        for t in threads:
            t.start()
        stalled = False
        while child.poll() is None:
            time.sleep(5)
            if time.monotonic() - last_out[0] > stall_s:
                stalled = True
                print(
                    "bench supervisor: no output for %.0f s; killing "
                    "the child (attempt %d)" % (stall_s, attempt + 1),
                    file=sys.stderr,
                )
                child.kill()
                break
        if stalled:
            # reap the killed child before relaunching (ADVICE r4: an
            # unreaped zombie + still-pumping threads raced the next
            # attempt's output interleaving)
            child.wait()
        for t in threads:
            t.join(timeout=30)
        if not stalled:
            sys.exit(child.wait())
    print("bench supervisor: stalled twice; giving up", file=sys.stderr)
    sys.exit(1)


if __name__ == "__main__":
    if os.environ.get("RAYNET_BENCH_CHILD"):
        main()
    else:
        supervise()
