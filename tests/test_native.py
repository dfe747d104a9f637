"""Native host library (C++/ctypes) vs the numpy/JAX oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from raynet_tpu import native

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native library unavailable"
)


def test_native_traversal_matches_oracle(rng):
    from oracles import voxel_traversal_oracle

    bbox = np.array([-1.0, -2.0, 0.0, 3.0, 2.0, 1.5], dtype=np.float32)
    grid_shape = (13, 9, 5)
    M, n = 48, 96
    starts = np.stack(
        [rng.uniform(-1, 3, n), rng.uniform(-2, 2, n), np.zeros(n)], 1
    ).astype(np.float32)
    ends = np.stack(
        [rng.uniform(-1, 3, n), rng.uniform(-2, 2, n), np.full(n, 1.5)], 1
    ).astype(np.float32)

    vox, cnt = native.voxel_traversal_batch(bbox, grid_shape, starts, ends, M)
    for i in range(n):
        ref, ref_cnt = voxel_traversal_oracle(
            bbox, grid_shape, starts[i], ends[i], M
        )
        assert cnt[i] == ref_cnt
        np.testing.assert_array_equal(vox[i, : cnt[i]], ref[:ref_cnt])


def test_native_first_hit_matches_numpy(rng):
    from raynet_tpu.utils.geometry import ray_triangles_intersection_mt

    tris = rng.rand(40, 3, 3).astype(np.float32) * 4 - 2
    origin = np.array([0.0, 0.0, -10.0], dtype=np.float32)
    dirs = rng.randn(32, 3).astype(np.float32)
    dirs[:, 2] = np.abs(dirs[:, 2]) + 1.0
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    depths, points = native.ray_mesh_first_hit(origin, dirs, tris)
    for i in range(len(dirs)):
        hits = ray_triangles_intersection_mt(
            origin, origin + dirs[i], tris[:, 0], tris[:, 1], tris[:, 2]
        )
        if len(hits) == 0:
            assert depths[i] == -1.0
        else:
            d = np.linalg.norm(hits - origin[None], axis=1).min()
            np.testing.assert_allclose(depths[i], d, rtol=2e-4, atol=1e-4)


def test_native_patches_match_image_patch(rng, mock_scene_dir):
    from raynet_tpu.common.scene import RestrepoScene

    scene = RestrepoScene(str(mock_scene_dir))
    im = scene.get_image(0)
    centers = np.stack(
        [rng.randint(-3, im.width + 3, 20), rng.randint(-3, im.height + 3, 20)],
        axis=1,
    ).astype(np.int32)
    patches, inside = native.extract_patches(im.image, centers, (5, 5))
    for k, (x, y) in enumerate(centers):
        ref = im.patch(np.array([[x], [y], [1]]), (5, 5))
        np.testing.assert_allclose(patches[k], ref, rtol=1e-6)


def test_native_scene_depth_map(mock_scene_dir):
    from raynet_tpu.common.scene import RestrepoScene
    from conftest import MOCK_H as H, MOCK_W as W

    scene = RestrepoScene(str(mock_scene_dir))
    dm = scene.get_depth_map(0)
    assert dm.shape == (H, W)
    # the quad at z=0 covers the whole FOV; camera ~20 away
    nz = dm[dm > 0]
    assert nz.size > 0.9 * dm.size
    assert abs(np.median(nz) - 20.0) < 1.0


def test_bp_plan_stats_matches_numpy_planner():
    """The native single-pass planner stats (exact K + per-block group
    spans) must reproduce the chunked-numpy forms bit-for-bit —
    including mirrored (flip) views and ANISOTROPIC grids (the numpy
    lerp previously indexed bins in original order and under-planned
    stripes on 256x256x128 grids)."""
    import raynet_tpu.ops.pallas.bp_beam as bb
    from raynet_tpu import native

    if not native.is_available():
        import pytest

        pytest.skip("native library unavailable")

    h, w = 96, 128
    grid = (64, 64, 32)
    bbox = np.asarray([-3, -3, -3, 3, 3, 3], float)

    for azim in (0.1, np.pi - 0.1):  # unflipped + mirrored
        K = np.array([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]])
        c = 16.0 * np.array([np.sin(azim), 0.1, -np.cos(azim)])
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        pp = np.linalg.pinv(K @ np.hstack([R, -R @ c.reshape(3, 1)]))
        st, _ = bb._plan_prologue(pp, c, bbox, grid, h, w, None, 256, 8)
        assert st is not None
        s, e, bins = st["s"], st["e"], st["bins"]
        perm, flip, S = st["perm"], st["flip"], st["S"]
        stats = st["block_stats"]
        assert stats is not None
        k_np = bb._exact_k(s, e, bbox, bins, perm, grid, flip)
        assert int(stats[0].max()) == k_np
        sa, sb = bb._group_spans(
            s, e, bbox, bins, perm, S, S // 8, rays=256, flip=flip,
            per_block=True,
        )
        np.testing.assert_array_equal(stats[1], sa)
        np.testing.assert_array_equal(stats[2], sb)


def test_plan_prologue_multi_matches_direct():
    """The fused multi-candidate planner (one native march at the finest
    rays-per-block, coarser candidates derived by reduction —
    bp_plan_agg + _needs_from_agg) must reproduce the direct
    per-candidate _plan_prologue block stats bit-for-bit on all-hit
    rigs, for both candidates, flipped and unflipped."""
    import raynet_tpu.ops.pallas.bp_beam as bb
    from raynet_tpu import native

    if not native.is_available():
        import pytest

        pytest.skip("native library unavailable")

    h, w = 96, 128
    grid = (64, 64, 32)
    bbox = np.asarray([-3, -3, -3, 3, 3, 3], float)

    for azim in (0.1, np.pi - 0.1):  # unflipped + mirrored
        K = np.array([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]])
        c = 16.0 * np.array([np.sin(azim), 0.1, -np.cos(azim)])
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        pp = np.linalg.pinv(K @ np.hstack([R, -R @ c.reshape(3, 1)]))
        multi = bb._plan_prologue_multi(
            pp, c, bbox, grid, h, w, None, [512, 256], 8
        )
        assert multi is not None
        for rays in (512, 256):
            st_d, reason = bb._plan_prologue(
                pp, c, bbox, grid, h, w, None, rays, 8
            )
            st_m, reason_m = multi[rays]
            assert (st_d is None) == (st_m is None), (reason, reason_m)
            kd, nad, nbd = st_d["block_stats"]
            km, nam, nbm = st_m["block_stats"]
            # direct pads to its own rays; multi pads to the coarsest
            # candidate, so it may carry extra all-duplicate tail blocks
            nb = len(kd)
            assert st_m["nb"] >= st_d["nb"]
            np.testing.assert_array_equal(kd, km[:nb])
            np.testing.assert_array_equal(nad, nam[:nb])
            np.testing.assert_array_equal(nbd, nbm[:nb])
        # the auto planner (fused path) equals the best per-candidate
        auto = bb.plan_bp_classes_auto(
            pp, c, bbox, grid, h, w, 16, 384, 512
        )
        per = [
            bb.plan_bp_classes(
                pp, c, bbox, grid, h, w, 16, 384, rays=r
            )
            for r in (512, 256)
        ]
        per = [p for p in per if p is not None]
        assert (auto is None) == (not per)
        if auto is not None:
            best = min(per, key=bb.classes_cost_ms)
            assert auto["cfg_large"] == best["cfg_large"]
        # the filtered config_auto path shares the same fused march
        idxs = np.arange(h * w, dtype=np.int32)
        cfg_auto = bb.plan_bp_config_auto(
            pp, c, bbox, grid, h, w, 16, 384, 512, ray_idxs=idxs
        )
        cfg_per = [
            bb.plan_bp_config(
                pp, c, bbox, grid, h, w, 16, 384, rays=r, ray_idxs=idxs
            )
            for r in (512, 256)
        ]
        cfg_per = [p for p in cfg_per if p is not None]
        assert (cfg_auto is None) == (not cfg_per)
        if cfg_auto is not None:
            assert cfg_auto == min(cfg_per, key=bb.plan_cost_ms)


def test_native_rays_entry_exit_matches_numpy():
    """The fused C++ slab-segment pass must agree with the numpy oracle
    to ~1 ulp (BLAS dgemm orders the 3-term pixel unprojection mul-adds
    differently, so bit-equality is not guaranteed) — including LINE
    misses, which must collapse to a zero-length mid-slab segment."""
    from raynet_tpu.ops.geometry import _host_rays_entry_exit_numpy

    h, w = 96, 128
    K = np.array([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]])
    c = 16.0 * np.array([np.sin(0.3), 0.1, -np.cos(0.3)])
    z = -c / np.linalg.norm(c)
    x = np.cross([0, 1, 0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    pp = np.linalg.pinv(K @ np.hstack([R, -R @ c.reshape(3, 1)]))
    idxs = np.arange(h * w, dtype=np.int32)

    for bbox in (
        np.array([-3, -3, -3, 3, 3, 3], float),  # hit
        np.array([100, 100, 100, 106, 106, 106], float),  # all miss
    ):
        s_n, e_n = native.rays_entry_exit(idxs, pp, c, bbox, h)
        s_o, e_o = _host_rays_entry_exit_numpy(
            idxs, pp, c, bbox, h, np.float64
        )
        np.testing.assert_allclose(s_n, s_o, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(e_n, e_o, rtol=1e-12, atol=1e-12)
        # zero-length collapse for misses must be EXACT (planners drop
        # miss rays by testing end - start == 0)
        miss = np.all(s_o == e_o, axis=1)
        assert np.array_equal(
            np.all(s_n == e_n, axis=1), miss
        )


def test_native_dom_sign_and_fill_matches_numpy():
    """The native in-place dominant-axis/miss-fill pass must reproduce
    the numpy form exactly: same dom/flip/reason, same filled segments
    (fill sources are the first hit row of each block)."""
    import raynet_tpu.ops.pallas.bp_beam as bb

    rng = np.random.RandomState(3)
    rays = 8
    bins = np.array([0.05, 0.04, 0.08])
    # Blocks: all-hit, mixed hit/miss, all-miss (fills from global first
    # hit). Hit rays march +dom; misses are zero-length rows.
    def seg(hit, n):
        s = rng.randn(n, 3)
        if hit:
            e = s + np.abs(rng.randn(n, 3)) * [3.0, 0.5, 0.5]
        else:
            e = s.copy()
        return s, e

    parts_s, parts_e = [], []
    for kind in ("hit", "mix", "miss"):
        s, e = seg(kind != "miss", rays)
        if kind == "mix":
            e[1::2] = s[1::2]  # alternate rows miss
        parts_s.append(s)
        parts_e.append(e)
    s = np.ascontiguousarray(np.concatenate(parts_s))
    e = np.ascontiguousarray(np.concatenate(parts_e))

    s_o, e_o, dom_o, flip_o, r_o = bb._dom_sign_and_fill_numpy(
        s.copy(), e.copy(), bins, rays
    )
    s_n, e_n = s.copy(), e.copy()
    dom_n, flip_n, r_n = native.dom_sign_and_fill(s_n, e_n, rays, bins)
    assert (dom_n, flip_n, r_n) == (dom_o, flip_o, r_o)
    np.testing.assert_array_equal(s_n, s_o)
    np.testing.assert_array_equal(e_n, e_o)

    # mixed dominant signs among hitting rays must reject identically
    e2 = e.copy()
    e2[0] = s[0] - (e[0] - s[0])
    s_m, e_m = s.copy(), e2.copy()
    _, flip_m, r_m = native.dom_sign_and_fill(s_m, e_m, rays, bins)
    _, _, _, flip_mo, r_mo = bb._dom_sign_and_fill_numpy(
        s.copy(), e2.copy(), bins, rays
    )
    assert flip_m is None and flip_mo is None and r_m == r_mo

    # empty (all-miss) input
    z = np.ascontiguousarray(np.tile(s[:rays], (1, 1)))
    _, flip_e, r_e = native.dom_sign_and_fill(
        z.copy(), z.copy(), rays, bins
    )
    assert flip_e is None and r_e == "empty-rays"


def _band_spans_oracle(perm, P, P_pinv, cc, bbox, h, w, padding, D,
                       group_d, rays_per_block):
    """Per-point numpy f64 oracle of native.band_plan_spans (the
    endpoint-monotonicity fast path must be invisible)."""
    from raynet_tpu.ops.geometry import _host_rays_entry_exit_numpy

    s, e = _host_rays_entry_exit_numpy(perm, P_pinv, cc, bbox, h, np.float64)
    hit = np.any(s != e, axis=1)
    frac = np.arange(D, dtype=np.float64) / (D - 1)
    pts = s[:, None, :] + frac[None, :, None] * (e - s)[:, None, :]  # (N,D,3)
    V = P.shape[0]
    offset = padding - (padding - 1) // 2
    hom = np.einsum("vij,ndj->vnid", P, np.concatenate(
        [pts, np.ones_like(pts[..., :1])], axis=-1))
    uv = hom[:, :, :2] / hom[:, :, 2:3]  # (V, N, 2, D)
    r = np.round(uv)
    r = np.where(np.isnan(r), -1e18, np.clip(r, -2e9, 2e9))
    f = r.astype(np.int64) + offset
    fx = np.clip(f[:, :, 0], 0, w)
    fy = np.clip(f[:, :, 1], 0, h)
    sent = (fx == 0) | (fy == 0) | ~hit[None, :, None]
    gd = min(group_d, D)
    ng = D // gd
    nb = len(perm) // rays_per_block
    fx = fx.reshape(V, nb, rays_per_block, ng, gd)
    fy = fy.reshape(V, nb, rays_per_block, ng, gd)
    sent = sent.reshape(V, nb, rays_per_block, ng, gd)
    big = 1 << 40
    min_x = np.where(sent, big, fx).min(axis=(2, 4))
    max_x = np.where(sent, -1, fx).max(axis=(2, 4))
    min_y = np.where(sent, big, fy).min(axis=(2, 4))
    max_y = np.where(sent, -1, fy).max(axis=(2, 4))
    empty = max_x < 0
    span_x = np.where(empty, 0, max_x - min_x)
    span_y = np.where(empty, 0, max_y - min_y)
    return np.stack(
        [span_y.max(axis=(1, 2)), span_x.max(axis=(1, 2))], axis=-1
    ).astype(np.int32)


@pytest.mark.skipif(not native.is_available(), reason="no native lib")
def test_native_band_plan_spans_matches_oracle(rng):
    """band_plan_spans == the per-point numpy oracle: the endpoint
    (Moebius-monotonicity) fast path must never change a box, including
    blocks whose rays clip the image border (clamp sentinels force the
    per-plane fallback) and bbox-miss rays (excluded entirely)."""
    h, w, V, D, padding = 96, 128, 4, 16, 11
    K = np.array([[160.0, 0, w / 2], [0, 160.0, h / 2], [0, 0, 1]])

    def cam(az, radius=12.0):
        c = radius * np.array([np.sin(az), 0.15, -np.cos(az)])
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        return K @ np.hstack([R, -R @ c.reshape(3, 1)]), c

    Ps, c0 = [], None
    for i in range(V):
        Pm, c = cam(0.35 * i)
        Ps.append(Pm)
        if i == 0:
            c0 = c
    P = np.stack(Ps)
    P_pinv = np.linalg.pinv(P[0])

    from raynet_tpu.ops.pallas.planesweep import tile_order

    idxs = jnp.arange(h * w, dtype=jnp.int32)
    perm = np.asarray(tile_order(idxs, h)[0], np.int32)

    # a small bbox (all rays hit) and a shifted one (border clipping +
    # misses exercise the sentinel/fallback paths)
    for bbox in (
        np.array([-2, -2, -2, 2, 2, 2], float),
        np.array([-1, -6, -1, 7, 2, 3], float),
    ):
        spans_n = native.band_plan_spans(
            perm, P, P_pinv, c0, bbox, h, w, padding, D, 4, 128
        )
        spans_o = _band_spans_oracle(
            perm, P, P_pinv, c0, bbox, h, w, padding, D, 4, 128
        )
        np.testing.assert_array_equal(spans_n, spans_o)
