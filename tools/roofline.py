"""Roofline / MFU accounting for the fused RayNet message step.

VERDICT r4 #5: `raynet_message_step_ms` has sat ~20 ms against a <20 ms
bar for two sessions; this tool states whether that IS the floor. It
computes EXACT op/byte counts for the two Pallas kernels from the same
planners the runtime uses (band specs for the sims kernel, BpBeamConfig
for the BP sweep) at the bench geometry (65,536 rays, D=32, V=5,
grid 256x256x128), and divides by v5e peaks.

v5e peak assumptions (public numbers; one chip / one TensorCore):
  MXU  : 197e12 bf16 FLOP/s  (= 98.5e12 MAC/s)
  VPU  : 8x128 lanes x 4 ALUs x 1.74 GHz ~= 7.1e12 f32 op/s
  VMEM : ~1 load + 1 store per VPU lane-op; bandwidth is not the
         binding constraint for these kernels (all operands are VMEM-
         resident; the DMA column below checks the HBM side)
  HBM  : 819e9 B/s

Run on CPU (planning is host work): /opt/venv/bin/python tools/roofline.py
"""
import numpy as np

MXU_MACS = 98.5e12
VPU_OPS = 7.1e12
HBM_BPS = 819e9

RAYS = 65536
H, W = 360, 640
D, V, M = 32, 5, 650
GRID = (256, 256, 128)
PADDING = 11


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


def sims_counts(box_specs, depth_planes=D, n_views=V, rays=RAYS):
    """Exact per-sweep op counts of the banded sims kernel inner loop
    (ops/pallas/planesweep.py::_kernel): per (block, view, group) an
    iota+compare+cast eq build over (ctr, Tt), one (ctr,128)x(ctr,Tt)
    MXU dot, and ~10 (32, Tt)-shaped VPU ops (pick tree, sumf, ssq)."""
    from raynet_tpu.ops.pallas.planesweep import RAYS_PER_BLOCK, _group_d

    gd = _group_d(depth_planes)
    G = depth_planes // gd
    Tt = gd * RAYS_PER_BLOCK
    nb = rays // RAYS_PER_BLOCK
    eq_elems = dot_macs = pick_ops = dma_bytes = 0
    for bh, bwg in box_specs:
        ctr = bh * bwg
        eq_elems += nb * G * ctr * Tt
        dot_macs += nb * G * ctr * 128 * Tt
        pick_ops += nb * G * 10 * 32 * Tt
        dma_bytes += nb * G * ctr * 128 * 2  # bf16 band copies
    return {
        "eq_build_vpu_ops": 3 * eq_elems,  # iota, compare, cast
        "dot_macs": dot_macs,
        "pick_vpu_ops": pick_ops,
        "band_dma_bytes": dma_bytes,
    }


def beam_counts(cfg, rays=RAYS):
    """Per-sweep op counts of the fused BP beam kernel
    (ops/pallas/bp_beam.py): the serial march+hat+recurrences issue
    ~55 (8, rays)-shaped ops per 8-slice group; the grid gather and the
    message scatter each build a one-hot/value pair over
    (rows, K*rays) per group (~2 ops/elem each) and run K batched
    (rows,128)x(rows,K*rays)-ish dots (bf16-truncated, see the bp_beam
    header)."""
    nb = rays // cfg.rays
    ng = cfg.S // 8
    rows = cfg.rows
    KR = cfg.K * cfg.rays
    march_ops = nb * ng * 55 * 8 * cfg.rays
    build_elems = nb * ng * rows * KR * 2  # gather + scatter builds
    dot_macs = nb * ng * 2 * rows * 128 * (KR // 128) * 128
    # HBM traffic: grid slice RMW per (group, stripe) both directions
    grid_bytes = nb * ng * 2 * 2 * rows * 128 * 4
    return {
        "march_vpu_ops": march_ops,
        "onehot_build_vpu_ops": 2 * build_elems,
        "gather_scatter_dot_macs": dot_macs,
        "grid_rmw_hbm_bytes": grid_bytes,
    }


def report(measured_ms=None):
    from raynet_tpu.ops.pallas.bp_beam import plan_bp_config_auto
    from raynet_tpu.ops.pallas.planesweep import plan_band_specs

    import jax.numpy as jnp

    P, P_pinv, center = _cameras(H, W, V)
    bbox = np.array([-3, -3, -3, 3, 3, 3], np.float64)
    bands = plan_band_specs(
        jnp.asarray(P, jnp.float32), jnp.asarray(P_pinv, jnp.float32),
        jnp.asarray(center, jnp.float32), jnp.asarray(bbox, jnp.float32),
        H, W, PADDING, D,
    )
    cfg = plan_bp_config_auto(
        P_pinv, center, bbox, GRID, H, W, D, M, RAYS, gamma=0.05
    )
    s = sims_counts(bands)
    b = beam_counts(cfg)
    rows = []
    rows.append(("sims eq build (VPU)", s["eq_build_vpu_ops"] / VPU_OPS))
    rows.append(("sims one-hot dot (MXU)", s["dot_macs"] / MXU_MACS))
    rows.append(("sims pick+reduce (VPU)", s["pick_vpu_ops"] / VPU_OPS))
    rows.append(("sims band DMA (HBM)", s["band_dma_bytes"] / HBM_BPS))
    rows.append(("beam march (VPU)", b["march_vpu_ops"] / VPU_OPS))
    rows.append((
        "beam one-hot builds (VPU)", b["onehot_build_vpu_ops"] / VPU_OPS
    ))
    rows.append((
        "beam gather/scatter dots (MXU)",
        b["gather_scatter_dot_macs"] / MXU_MACS,
    ))
    rows.append(("beam grid RMW (HBM)", b["grid_rmw_hbm_bytes"] / HBM_BPS))
    print("band specs:", bands, " beam cfg rows/K/S:",
          (cfg.rows, cfg.K, cfg.S, cfg.rays))
    print("%-34s %10s" % ("component", "floor ms"))
    total = 0.0
    for name, sec in rows:
        print("%-34s %10.3f" % (name, sec * 1e3))
        total += sec
    print("%-34s %10.3f" % ("sum of floors (no overlap)", total * 1e3))
    if measured_ms:
        print("measured message step: %.1f ms -> %.0f%% of the no-overlap "
              "floor sum" % (measured_ms, 100 * total * 1e3 / measured_ms))
    return rows


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    report(measured_ms=20.1)
