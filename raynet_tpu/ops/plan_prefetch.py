"""Cross-view plan prefetcher: overlap every view's device plan programs.

The orchestrator's per-view plan loop is a serial chain per reference
view — program A (segments/stats), a scalar sync, program B (block
aggregates), an aggregate download, the span program, a span download —
and through the axon tunnel each sync/download stalls the host ~40 ms
while the device sits idle (~0.3-0.45 s/view total at DTU resolution,
x49 views of a scene). The programs of DIFFERENT views are independent,
so this module enqueues them group-wise ahead of the loop:

  - program A for a group of views, then ONE stacked scalar sync for
    the whole group (the dom/flip decision is host-side and gates the
    static perm of program B);
  - program B + the whole-view span program per view, back to back,
    with their downloads started async (``copy_to_host_async`` is
    genuinely asynchronous on axon — CLAUDE.md);
  - results parked in one-shot caches (`bp_plan_device._STATE_PREFETCH`,
    `planesweep._SPANS_PREFETCH`) that the unchanged per-view planners
    pop.

Wall time of the plan phase drops from ~sum(device + host latency) to
~sum(device) + one sync per group. Only the unfiltered path prefetches
(GT-filtered ray lists differ per view and flow through the per-view
calls unchanged).

Reference analog: none — the reference plans nothing (its CUDA kernels
take the worst case globally); this is the cost of exact static-shape
planning for XLA/Mosaic, paid once per scene and pipelined here.
"""
import numpy as np
import jax
import jax.numpy as jnp

from . import bp_plan_device as bpd
from .pallas import bp_beam as _bb
from .pallas import planesweep as _ps


def prefetch_view_plans(cam_sets, bbox, grid_shape, height, width,
                        padding, depth_planes, unit, spans=True,
                        group=8):
    """Enqueue + async-download the plan programs for every view.

    cam_sets: list of (P_set (V,3,4) f32, P_pinv (4,3) f32, center (3,)
    f32) numpy camera tuples — the same objects the per-view planners
    will be called with (prefetch keys are exact-byte matches).
    Returns the number of views prefetched (0 = prefetch inactive)."""
    if not bpd._use_device_planner():
        return 0
    cands = _bb.rays_candidates(unit)
    if len(cands) <= 1:
        # single-candidate plans take the non-multi path whose fine/key
        # differs; not the production shape — skip
        return 0
    fine = min(cands)
    coarse = max(cands)
    if any(r % fine for r in cands):
        return 0

    bpd._STATE_PREFETCH.clear()
    _ps._SPANS_PREFETCH.clear()

    bbox64 = np.asarray(bbox, np.float64).reshape(6)
    bbox_f32 = bbox64.astype(np.float32)
    grid_t = tuple(int(g) for g in grid_shape)
    bins = (bbox64[3:] - bbox64[:3]) / np.asarray(grid_t, np.float64)
    n = height * width

    # the same committed tile-order list _plan_prologue_multi uses
    cache_key = ("tile", height, width, coarse)
    if cache_key in bpd._IDX_CACHE:
        idx_dev = bpd._IDX_CACHE[cache_key]
        n_padded = int(idx_dev.shape[0])
    else:
        perm_t = bpd.unfiltered_tile_idxs(height, width, coarse)
        idx_dev = jax.device_put(perm_t)
        bpd._IDX_CACHE[cache_key] = idx_dev
        n_padded = len(perm_t)

    do_spans = spans and depth_planes % _ps._group_d(depth_planes) == 0
    sidx = _ps._band_idx_dev(height, width) if do_spans else None

    count = 0
    for g0 in range(0, len(cam_sets), group):
        grp = cam_sets[g0:g0 + group]
        handles = []
        for (P_set, P_pinv, center) in grp:
            s, e, fill, abs_sums, n_hit, n_pos, n_neg = (
                bpd._segments_stats(
                    idx_dev,
                    jnp.asarray(P_pinv, jnp.float32),
                    jnp.asarray(center, jnp.float32),
                    jnp.asarray(bbox_f32),
                    height=int(height), fine=int(fine),
                )
            )
            scal = jnp.concatenate([
                abs_sums,
                jnp.stack([n_hit.astype(jnp.float32)]),
                n_pos.astype(jnp.float32),
                n_neg.astype(jnp.float32),
            ])
            handles.append((s, e, fill, scal))
            # spans are camera-only — enqueue right away so the span
            # programs interleave with the other views' A/B programs
            if do_spans:
                skey = _ps._spans_prefetch_key(
                    P_set, P_pinv, center, bbox_f32, height, width,
                    padding, depth_planes,
                )
                sh = _ps._plan_spans_max(
                    sidx, np.asarray(P_set, np.float32),
                    np.asarray(P_pinv, np.float32),
                    np.asarray(center, np.float32), bbox_f32,
                    height, width, padding, depth_planes,
                )
                try:
                    sh.copy_to_host_async()
                except Exception:
                    pass
                _ps._SPANS_PREFETCH[skey] = sh
        # ONE scalar sync for the whole group
        allscal = np.asarray(jnp.stack([h[3] for h in handles]))
        for (P_set, P_pinv, center), (s, e, fill, _), stats in zip(
            grp, handles, allscal
        ):
            key = bpd._plan_state_key(
                cache_key, P_pinv, center, bbox64, grid_t, height, fine
            )
            abs_sums, n_hit = stats[:3], stats[3]
            n_pos, n_neg = stats[4:7], stats[7:10]
            dom, flip, reason = bpd._decide_dom_flip(
                abs_sums, n_hit, n_pos, n_neg, bins
            )
            if flip is None:
                bpd._STATE_PREFETCH[key] = (None, reason)
                count += 1
                continue
            others = [a for a in range(3) if a != dom]
            perm = (dom, others[0], others[1])
            S = grid_t[dom]
            if S % 8:
                # the consumer would reject this grid before touching
                # the aggregates — store the decision, never a state
                # whose s/e/fill are None and packed is absent
                bpd._STATE_PREFETCH[key] = (None, "s-mod-8")
                count += 1
                continue
            pb = np.asarray([bins[a] for a in perm], np.float64)
            packed = bpd._agg_device(
                s, e, fill,
                jnp.asarray(bbox64[:3], jnp.float32),
                jnp.asarray(pb, jnp.float32),
                jnp.float32(S * pb[0]),
                perm=perm, flip=bool(flip), S=int(S),
                ngrp=int(S) // 8, fine=int(fine),
            )
            try:
                packed.copy_to_host_async()
            except Exception:
                pass
            state = dict(
                s=None, e=None, fill=None, bins=bins, bbox=bbox64,
                grid_shape=grid_t, dom=dom, flip=flip, n=n_padded,
                packed=packed,
            )
            bpd._STATE_PREFETCH[key] = (state, "ok")
            count += 1
        handles = None
    return count
