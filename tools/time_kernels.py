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
    ap.add_argument("--dma_slots", type=int, default=None,
                    help="A/B: sims band-DMA pipeline depth")
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
