"""Standalone kernel timers for the two Pallas hot paths.

The axon tunnel's run-to-run variance is +-20% on orchestrated numbers,
so sub-10% kernel effects need these isolated timers (CLAUDE.md
"Measurement discipline"). Times, at bench geometry (65k rays, D=32,
V=5, grid 256x256x128, M=650):

  - the banded plane-sweep kernel (pure: inputs precomputed/committed)
  - the strict-sims front end + kernel (banded_scores_from_segments)
  - the fused BP beam message kernel (pure)

Usage (real TPU):
  /opt/venv/bin/python tools/time_kernels.py [--group_d 8] [--rays 65536]

--group_d overrides the plane-sweep depth-group size (targets per tile
= 128 * group_d) BEFORE any tracing, for A/B runs in separate
processes.
"""
import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group_d", type=int, default=None)
    ap.add_argument("--rays_block", type=int, default=None,
                    help="override planesweep.RAYS_PER_BLOCK (A/B)")
    ap.add_argument("--tile_w", type=int, default=None,
                    help="pixel-tile width for ray blocking (A/B: 32 "
                         "with --rays_block 256 keeps one tile == one "
                         "block)")
    ap.add_argument("--beam_rays", type=int, default=512,
                    help="beam kernel rays-per-block (plan_bp_config)")
    ap.add_argument("--hat_off", action="store_true",
                    help="A/B: replace the beam kernel's hat D-loop "
                         "with ts (cost isolation; WRONG results)")
    ap.add_argument("--hat_loop", action="store_true",
                    help="A/B: force the D-iteration hat loop instead "
                         "of the 2-tap gather lerp")
    ap.add_argument("--no_dot", action="store_true",
                    help="A/B: skip the sims one-hot MXU dot "
                         "(cost isolation; WRONG results)")
    ap.add_argument("--no_eq", action="store_true",
                    help="A/B: build-free sims eq operand "
                         "(cost isolation; WRONG results)")
    ap.add_argument("--no_pick", action="store_true",
                    help="A/B: skip the sims 4-way sub-lane pick "
                         "(cost isolation; WRONG results)")
    ap.add_argument("--front_bisect", action="store_true",
                    help="attribute the sims XLA front end by stage")
    ap.add_argument("--dma_slots", type=int, default=None,
                    help="A/B: sims band-DMA pipeline depth")
    ap.add_argument("--no_pipeline_eq", action="store_true",
                    help="A/B: build each eq operand at its own "
                         "iteration (no VPU/MXU overlap)")
    ap.add_argument("--sims_only", action="store_true",
                    help="exit after the sims timers (skip the beam/"
                         "fused compiles — each 30-150 s remote)")
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode smoke run (CPU)")
    args = ap.parse_args()

    import raynet_tpu.ops.pallas.planesweep as ps

    if args.interpret:  # CPU smoke run: interpret EVERY pallas call
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()

    if args.group_d:
        ps.GROUP_D = args.group_d
        print("GROUP_D=%d" % (ps.GROUP_D,), file=sys.stderr)
    if args.rays_block:
        ps.RAYS_PER_BLOCK = args.rays_block
        print("RAYS_PER_BLOCK=%d" % (ps.RAYS_PER_BLOCK,), file=sys.stderr)
    if args.tile_w:
        ps.TILE_W = args.tile_w
        print("TILE_W=%d" % (ps.TILE_W,), file=sys.stderr)
    if args.hat_off:
        import raynet_tpu.ops.pallas.bp_beam as bb

        bb._DEBUG_HAT_OFF = True
        print("HAT_OFF", file=sys.stderr)
    if args.hat_loop:
        import raynet_tpu.ops.pallas.bp_beam as bb

        bb._HAT_GATHER = False
        print("HAT_LOOP", file=sys.stderr)
    if args.no_dot:
        ps._DEBUG_NO_DOT = True
        print("NO_DOT", file=sys.stderr)
    if args.no_eq:
        ps._DEBUG_NO_EQ = True
        print("NO_EQ", file=sys.stderr)
    if args.no_pick:
        ps._DEBUG_NO_PICK = True
        print("NO_PICK", file=sys.stderr)
    if args.dma_slots:
        ps._DMA_SLOTS = args.dma_slots
    if args.no_pipeline_eq:
        ps._PIPELINE_EQ = False
        print("NO_PIPELINE_EQ", file=sys.stderr)
        print("DMA_SLOTS=%d" % (ps._DMA_SLOTS,), file=sys.stderr)

    import jax
    import jax.numpy as jnp

    from raynet_tpu.ops import fused
    from raynet_tpu.ops.geometry import (
        rays_from_pixel_idxs, rays_entry_exit_bbox,
    )

    sys.path.insert(0, ".")
    from bench import _cameras  # same rig as the driver bench

    h, w = 360, 640
    n_views, depth_planes, padding = 5, 32, 11
    n = args.rays
    rng = np.random.RandomState(0)
    P_np, P_pinv_np, center_np = _cameras(h, w, n_views)
    P = jnp.asarray(P_np, jnp.float32)
    P_pinv = jnp.asarray(P_pinv_np, jnp.float32)
    center = jnp.asarray(center_np, jnp.float32)
    bbox = jnp.asarray([-3, -3, -3, 3, 3, 3], jnp.float32)
    features = jax.device_put(
        rng.randn(n_views, h + padding + 1, w + padding + 1, 32)
        .astype(np.float32).astype(jnp.bfloat16)
    )

    bands = ps.plan_band_specs(
        P, P_pinv, center, bbox, h, w, padding, depth_planes
    )
    print("band specs:", bands, file=sys.stderr)

    all_idxs = jnp.arange(h * w, dtype=jnp.int32)
    perm, _ = ps.tile_order(all_idxs, h)
    idxs = jax.device_put(perm[:n])

    dirs = rays_from_pixel_idxs(idxs, P_pinv, center, h)
    s, e = rays_entry_exit_bbox(dirs, center, bbox[:3], bbox[3:])
    s, e = jax.device_put(s), jax.device_put(e)
    packed = ps.pack_features_for_bands(features, bands)
    packed = jax.device_put(packed)

    def timed(fn, fargs, label, sync):
        # one throwaway timed workload first: the FIRST timed function of
        # a process measures ~80 ms/call inflated on axon
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            outs = [fn(*fargs) for _ in range(args.iters)]
            sync(outs)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print("%-28s %8.2f ms / %dk rays"
              % (label, best * 1e3, n // 1024))
        return best

    # 1. strict sims: front end + banded kernel. The packed stack is a
    # jit ARGUMENT — a closed-over device array becomes an HLO constant
    # (slow remote-compile upload, possible folding).
    @jax.jit
    def sims(s, e, features, fp_, f00_):
        pair, fits = ps.banded_scores_from_segments(
            features, P, s, e, depth_planes, padding, h, w, bands,
            packed=(fp_, f00_),
        )
        return pair.sum() + fits.astype(jnp.float32)

    sims_args = (s, e, features, packed[0], packed[1])
    sims(*sims_args)  # compile
    timed(sims, sims_args, "warm-in (discard)",
          lambda o: float(jnp.stack(o).sum()))
    timed(sims, sims_args, "strict sims (front+kernel)",
          lambda o: float(jnp.stack(o).sum()))

    # 1b. pure banded kernel: front-end outputs precomputed + committed,
    # so (strict sims) - (this) = the XLA front-end share
    hfp, wgp = packed[0].shape[1], packed[0].shape[2]

    @jax.jit
    def sims_front(s, e):
        return ps.banded_front_end(
            P, s, e, depth_planes, padding, h, w, bands, hfp, wgp,
            n_views,
        )

    cellids, origins, _ = jax.block_until_ready(sims_front(s, e))
    cellids = jax.device_put(cellids)
    origins = jax.device_put(origins)

    @jax.jit
    def sims_kernel(fp_, origins_, cellids_, f00_):
        pair = ps._banded_pair_sums(
            fp_, origins_, cellids_, f00_, tuple(bands), n_views,
            depth_planes,
        )
        return pair.sum()

    kargs = (packed[0], origins, cellids, packed[1])
    sims_kernel(*kargs)  # compile
    timed(sims_kernel, kargs, "banded kernel (pure)",
          lambda o: float(jnp.stack(o).sum()))
    if args.sims_only:
        return

    if args.front_bisect:
        # attribute the XLA front end: full, and with the tail stages
        # cut (cells = cid packing + (nb,d,128)->(nb,1,T) relayout;
        # mins = per-group reductions + origins; proj = the lerp +
        # projection + round/clip chain)
        @jax.jit
        def front_full(s, e):
            c, o, f = sims_front(s, e)
            return c.sum() + o.sum() + f.astype(jnp.int32)

        def _mk_partial(stage):
            nb = n // ps.RAYS_PER_BLOCK
            d = depth_planes

            @jax.jit
            def fn(s, e):
                def lanes(x):
                    return x.reshape(nb, 1, ps.RAYS_PER_BLOCK)

                frac = (
                    jnp.arange(d, dtype=jnp.float32) / jnp.float32(d - 1)
                ).reshape(1, d, 1)
                pc = []
                for a in range(3):
                    s_ = lanes(s[:, a])
                    pc.append(s_ + frac * (lanes(e[:, a]) - s_))
                miss = lanes(
                    jnp.all(s == e, axis=1).astype(jnp.int32)
                ) > 0
                offset = padding - (padding - 1) // 2
                acc = jnp.float32(0.0)
                for vi in range(n_views):
                    Pv = P[vi]
                    u = (Pv[0, 0] * pc[0] + Pv[0, 1] * pc[1]
                         + Pv[0, 2] * pc[2] + Pv[0, 3])
                    w_ = (Pv[1, 0] * pc[0] + Pv[1, 1] * pc[1]
                          + Pv[1, 2] * pc[2] + Pv[1, 3])
                    z_ = (Pv[2, 0] * pc[0] + Pv[2, 1] * pc[1]
                          + Pv[2, 2] * pc[2] + Pv[2, 3])
                    fx = jnp.clip(
                        jnp.round(u / z_).astype(jnp.int32) + offset,
                        0, w,
                    )
                    fy = jnp.clip(
                        jnp.round(w_ / z_).astype(jnp.int32) + offset,
                        0, h,
                    )
                    ez = (fx == 0) | (fy == 0) | miss
                    fx = jnp.where(ez, 0, fx)
                    fy = jnp.where(ez, 0, fy)
                    if stage == "proj":
                        acc = acc + fx.sum() + fy.sum()
                        continue
                    gd = ps._group_d(d)
                    G = d // gd
                    big = jnp.int32(1 << 20)
                    gx = fx.reshape(nb, G, gd * ps.RAYS_PER_BLOCK)
                    gy = fy.reshape(nb, G, gd * ps.RAYS_PER_BLOCK)
                    gs = ez.reshape(nb, G, gd * ps.RAYS_PER_BLOCK)
                    mnx = jnp.where(gs, big, gx).min(axis=2)
                    mny = jnp.where(gs, big, gy).min(axis=2)
                    mxx = jnp.where(gs, -1, gx).max(axis=2)
                    mxy = jnp.where(gs, -1, gy).max(axis=2)
                    acc = (acc + mnx.sum() + mny.sum() + mxx.sum()
                           + mxy.sum())
                return acc

            return fn

        for stage in ("proj", "mins"):
            fn = _mk_partial(stage)
            fn(s, e)
            timed(fn, (s, e), "front %s-only" % stage,
                  lambda o: float(jnp.stack(o).sum()))
        front_full(s, e)
        timed(front_full, (s, e), "front full",
              lambda o: float(jnp.stack(o).sum()))

    # 2. fused BP beam message step (sims + beam kernel, production path)
    from raynet_tpu.ops.pallas.bp_beam import plan_bp_config

    grid_shape = (256, 256, 128)
    max_voxels = 650
    cfg = plan_bp_config(
        P_pinv_np, center_np, np.asarray([-3, -3, -3, 3, 3, 3], float),
        grid_shape, h, w, depth_planes, max_voxels, gamma=0.05,
        rays=args.beam_rays,
    )
    print("bp cfg:", cfg, file=sys.stderr)
    if cfg is None:
        return
    msgs = jnp.zeros((n, cfg.slots), jnp.float32)
    acc = jnp.full((int(np.prod(grid_shape)),), -3.0, jnp.float32)

    @jax.jit
    def step(idxs, features, msgs, acc):
        new_msgs, scatter, _, _ = fused.raynet_beam_message_step(
            idxs, features, P, P_pinv, center, bbox, msgs, acc,
            jnp.int32(n), h, w, padding, depth_planes, cfg,
            band_specs=bands, strict_bands=True,
        )
        return new_msgs.sum() + scatter.sum()

    step(idxs, features, msgs, acc)  # compile
    timed(step, (idxs, features, msgs, acc), "fused message step",
          lambda o: float(jnp.stack(o).sum()))

    # 3. beam kernel alone (precomputed scores)
    S_planes = jax.device_put(
        jax.nn.softmax(
            jnp.asarray(rng.randn(n, depth_planes), jnp.float32), axis=-1
        )
    )

    @jax.jit
    def beam(s_planes, msgs, acc):
        new_msgs, scatter, _, _ = fused.raynet_beam_message_step(
            idxs, features, P, P_pinv, center, bbox, msgs, acc,
            jnp.int32(n), h, w, padding, depth_planes, cfg,
            band_specs=bands, S_planes=s_planes, strict_bands=True,
        )
        return new_msgs.sum() + scatter.sum()

    beam(S_planes, msgs, acc)  # compile
    timed(beam, (S_planes, msgs, acc), "beam kernel (cached scores)",
          lambda o: float(jnp.stack(o).sum()))

    # 4. decomposition rows: first_iteration elides the occupancy GATHER
    # (mu is the constant prior); the depth step elides the SCATTER (and
    # the message write). full - first_iter ~= gather; full - depth ~=
    # scatter.
    @jax.jit
    def beam_first(s_planes, msgs, acc):
        new_msgs, scatter, _, _ = fused.raynet_beam_message_step(
            idxs, features, P, P_pinv, center, bbox, msgs, acc,
            jnp.int32(n), h, w, padding, depth_planes, cfg,
            band_specs=bands, S_planes=s_planes, strict_bands=True,
            first_iteration=True,
        )
        return new_msgs.sum() + scatter.sum()

    beam_first(S_planes, msgs, acc)  # compile
    timed(beam_first, (S_planes, msgs, acc), "beam first-iter (no gather)",
          lambda o: float(jnp.stack(o).sum()))

    @jax.jit
    def beam_depth(s_planes, msgs, acc):
        depth, _ = fused.raynet_beam_depth_step(
            idxs, features, P, P_pinv, center, bbox, msgs, acc,
            h, w, padding, depth_planes, cfg,
            band_specs=bands, S_planes=s_planes, strict_bands=True,
        )
        return depth.sum()

    beam_depth(S_planes, msgs, acc)  # compile
    timed(beam_depth, (S_planes, msgs, acc), "beam depth (no scatter)",
          lambda o: float(jnp.stack(o).sum()))


if __name__ == "__main__":
    main()
