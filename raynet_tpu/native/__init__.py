"""ctypes bindings for the native host library (libraynet_host.so).

Built lazily with make on first use; every entry point has a numpy fallback
so the framework works without a compiler. The native paths accelerate the
host-side data pipeline: batched DDA for sample generation, GT-depth
raycasts, and patch gathers.
"""
import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libraynet_host.so")
_lib = None
_tried = False


def _build():
    subprocess.run(
        ["make", "-C", _HERE, "-s"],
        check=True,
        capture_output=True,
    )


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        # rebuild stale binaries too: a .so from before a new entry
        # point existed would fail symbol lookup below and silently
        # disable EVERY native path
        src_mtime = max(
            os.path.getmtime(os.path.join(_HERE, f))
            for f in ("raynet_host.cpp", "Makefile")
        )
        if (
            not os.path.isfile(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < src_mtime
        ):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

        lib.voxel_traversal_batch.argtypes = [
            f32p, i32p, f32p, f32p,
            ctypes.c_int, ctypes.c_int, i32p, i32p,
        ]
        lib.voxel_traversal_batch.restype = None

        lib.ray_mesh_first_hit.argtypes = [
            f32p, f32p, ctypes.c_int, f32p, ctypes.c_int, f32p, f32p,
        ]
        lib.ray_mesh_first_hit.restype = None

        lib.extract_patches.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
        ]
        lib.extract_patches.restype = ctypes.c_int

        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.bp_plan_stats.argtypes = [
            f64p, f64p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, f64p, ctypes.c_double, ctypes.c_double,
            i32p, i32p, i32p,
        ]
        lib.bp_plan_stats.restype = None

        lib.bp_plan_stats_raw.argtypes = [
            f64p, f64p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, f64p, i32p, ctypes.c_int, f64p,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            i32p, i32p, i32p,
        ]
        lib.bp_plan_stats_raw.restype = None

        f64p2 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.bp_plan_agg.argtypes = [
            f64p, f64p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, f64p, i32p, ctypes.c_int, f64p,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            i32p, f64p2, f64p2, f64p2, f64p2,
        ]
        lib.bp_plan_agg.restype = None

        lib.rays_entry_exit.argtypes = [
            i32p, ctypes.c_int64, f64p, f64p, f64p, ctypes.c_int,
            f64p, f64p,
        ]
        lib.rays_entry_exit.restype = None

        lib.dom_sign_and_fill.argtypes = [
            f64p, f64p, ctypes.c_int64, ctypes.c_int, f64p, i32p, i32p,
        ]
        lib.dom_sign_and_fill.restype = ctypes.c_int

        lib.band_plan_spans.argtypes = [
            i32p, ctypes.c_int64, f64p, ctypes.c_int, f64p, f64p, f64p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, i32p,
        ]
        lib.band_plan_spans.restype = None

        _lib = lib
    except Exception:
        _lib = None
    return _lib


def is_available():
    return get_lib() is not None


def voxel_traversal_batch(bbox, grid_shape, starts, ends, max_voxels):
    """Batched host DDA. Returns ((n, M, 3) int32 indices, (n,) counts)."""
    lib = get_lib()
    starts = np.ascontiguousarray(starts, dtype=np.float32)
    ends = np.ascontiguousarray(ends, dtype=np.float32)
    n = len(starts)
    out_idx = np.zeros((n, max_voxels, 3), dtype=np.int32)
    out_cnt = np.zeros((n,), dtype=np.int32)
    lib.voxel_traversal_batch(
        np.ascontiguousarray(bbox, dtype=np.float32).reshape(6),
        np.ascontiguousarray(grid_shape, dtype=np.int32).reshape(3),
        starts, ends, n, max_voxels, out_idx, out_cnt,
    )
    return out_idx, out_cnt


def ray_mesh_first_hit(origin, directions, triangles):
    """First-hit depths of N unit-direction rays against (T, 3, 3) triangles.

    Returns (depths (N,) — -1 for misses, points (N, 3)).
    """
    lib = get_lib()
    directions = np.ascontiguousarray(directions, dtype=np.float32)
    n = len(directions)
    tris = np.ascontiguousarray(triangles, dtype=np.float32).reshape(-1, 9)
    out_depth = np.zeros((n,), dtype=np.float32)
    out_points = np.zeros((n, 3), dtype=np.float32)
    lib.ray_mesh_first_hit(
        np.ascontiguousarray(origin, dtype=np.float32).reshape(3),
        directions, n, tris, len(tris), out_depth, out_points,
    )
    return out_depth, out_points


def extract_patches(image, centers, patch_size):
    """Zero-padded patch gather around integer (x, y) centers.

    Returns (patches (n, ph, pw, c), n_fully_inside).
    """
    lib = get_lib()
    image = np.ascontiguousarray(image, dtype=np.float32)
    h, w, c = image.shape
    centers = np.ascontiguousarray(centers, dtype=np.int32)
    n = len(centers)
    ph, pw = patch_size
    out = np.zeros((n, ph, pw, c), dtype=np.float32)
    inside = lib.extract_patches(image, h, w, c, centers, n, ph, pw, out)
    return out, inside


def rays_entry_exit(ray_idxs, P_pinv, camera_center, bbox, height):
    """Fused f64 pixel-ray / bbox slab segments (see raynet_host.cpp).

    ``ray_idxs`` must be non-negative pixel ids (callers decode the
    negative pad encoding first). Returns (ray_start, ray_end) (n, 3)
    f64 — semantics identical to the numpy form in
    ops.geometry.host_rays_entry_exit, including miss collapse.
    """
    lib = get_lib()
    idxs = np.ascontiguousarray(ray_idxs, dtype=np.int32)
    n = len(idxs)
    out_s = np.empty((n, 3), dtype=np.float64)
    out_e = np.empty((n, 3), dtype=np.float64)
    lib.rays_entry_exit(
        idxs, n,
        np.ascontiguousarray(P_pinv, dtype=np.float64).reshape(4, 3),
        np.ascontiguousarray(camera_center, dtype=np.float64).reshape(3),
        np.ascontiguousarray(bbox, dtype=np.float64).reshape(6),
        int(height), out_s, out_e,
    )
    return out_s, out_e


def band_plan_spans(ray_idxs, P, P_pinv, camera_center, bbox, height,
                    width, padding, depth_planes, group_d, rays_per_block):
    """Per-view (y_span, x_span) maxima over all (ray-block, depth-group)
    sub-band boxes (see raynet_host.cpp band_plan_spans). ``ray_idxs``
    must be tile-ordered, non-negative, and a multiple of
    ``rays_per_block`` long. Returns (V, 2) int32 spans."""
    lib = get_lib()
    idxs = np.ascontiguousarray(ray_idxs, dtype=np.int32)
    P = np.ascontiguousarray(P, dtype=np.float64)
    n_views = P.shape[0]
    out = np.zeros((n_views, 2), dtype=np.int32)
    lib.band_plan_spans(
        idxs, len(idxs), P.reshape(-1), int(n_views),
        np.ascontiguousarray(P_pinv, dtype=np.float64).reshape(4, 3),
        np.ascontiguousarray(camera_center, dtype=np.float64).reshape(3),
        np.ascontiguousarray(bbox, dtype=np.float64).reshape(6),
        int(height), int(width), int(padding), int(depth_planes),
        int(group_d), int(rays_per_block), out,
    )
    return out


def bp_plan_stats(st, en, rays, S, ngrp, pbins, slack, eps):
    """Per-block beam-planner statistics (see raynet_host.cpp).

    ``st``/``en``: (n, 3) f64 PERMUTED, flip-applied, bbox-min-relative
    segment endpoints, n a multiple of ``rays``. Returns per-block
    int32 arrays of length n // rays: (k_max, need_a, need_b) —
    max slice emissions plus snap-aware lateral box needs.
    """
    lib = get_lib()
    st = np.ascontiguousarray(st, dtype=np.float64)
    en = np.ascontiguousarray(en, dtype=np.float64)
    n = len(st)
    nb = n // rays
    k_blk = np.zeros((nb,), dtype=np.int32)
    need_a = np.zeros((nb,), dtype=np.int32)
    need_b = np.zeros((nb,), dtype=np.int32)
    lib.bp_plan_stats(
        st, en, n, int(rays), int(S), int(ngrp),
        np.ascontiguousarray(pbins, dtype=np.float64).reshape(3),
        float(slack), float(eps), k_blk, need_a, need_b,
    )
    return k_blk, need_a, need_b


def dom_sign_and_fill(s, e, rays, bins3):
    """Dominant axis + march direction + block-local miss fill, IN PLACE
    on ``s``/``e`` (owned (n, 3) f64 C-contiguous arrays). Returns
    (dom, flip, reason) matching ops.pallas.bp_beam._dom_sign_and_fill:
    flip is None with reason "empty-rays"/"mixed-dominant-sign" on
    rejection.
    """
    lib = get_lib()
    assert s.dtype == np.float64 and s.flags.c_contiguous
    assert e.dtype == np.float64 and e.flags.c_contiguous
    dom = np.zeros((1,), np.int32)
    flip = np.zeros((1,), np.int32)
    code = lib.dom_sign_and_fill(
        s, e, len(s), int(rays),
        np.ascontiguousarray(bins3, dtype=np.float64).reshape(3),
        dom, flip,
    )
    if code == 1:
        return 0, None, "empty-rays"
    if code == 2:
        return int(dom[0]), None, "mixed-dominant-sign"
    return int(dom[0]), bool(flip[0]), "ok"


def bp_plan_agg(s, e, rays, S, ngrp, pbins, perm, flip, bmin, ext,
                slack, eps):
    """Raw per-block planner aggregates at the FINEST rays-per-block:
    (k_blk (nb,) int32, lo_a, hi_a, lo_b, hi_b (nb, ngrp) f64 floors).
    One march per ray serves every coarser candidate — coarse blocks
    reduce over consecutive fine sub-blocks (bp_beam._needs_from_agg).
    Marshalling semantics identical to :func:`bp_plan_stats_raw`."""
    lib = get_lib()
    s = np.ascontiguousarray(s, dtype=np.float64)
    e = np.ascontiguousarray(e, dtype=np.float64)
    n = len(s)
    nb = n // rays
    k_blk = np.zeros((nb,), dtype=np.int32)
    lo_a = np.empty((nb, ngrp), dtype=np.float64)
    hi_a = np.empty((nb, ngrp), dtype=np.float64)
    lo_b = np.empty((nb, ngrp), dtype=np.float64)
    hi_b = np.empty((nb, ngrp), dtype=np.float64)
    lib.bp_plan_agg(
        s, e, n, int(rays), int(S), int(ngrp),
        np.ascontiguousarray(pbins, dtype=np.float64).reshape(3),
        np.ascontiguousarray(perm, dtype=np.int32).reshape(3),
        int(bool(flip)),
        np.ascontiguousarray(bmin, dtype=np.float64).reshape(3),
        float(ext), float(slack), float(eps),
        k_blk, lo_a, hi_a, lo_b, hi_b,
    )
    return k_blk, lo_a, hi_a, lo_b, hi_b


def bp_plan_stats_raw(s, e, rays, S, ngrp, pbins, perm, flip, bmin, ext,
                      slack, eps):
    """bp_plan_stats with the permute/flip/bbox-shift marshalling fused
    into the C++ pass (no (n, 3) numpy temporaries — ~0.5 s per 720p
    view on a single-core host).

    ``s``/``e``: (n, 3) f64 ORIGINAL-axis camera-frame segment
    endpoints; ``pbins`` is permuted (bins[perm]); ``bmin`` is the bbox
    min in ORIGINAL axis order; ``ext`` = S * pbins[0]. Bit-identical
    to marshalling on the Python side then calling bp_plan_stats.
    """
    lib = get_lib()
    s = np.ascontiguousarray(s, dtype=np.float64)
    e = np.ascontiguousarray(e, dtype=np.float64)
    n = len(s)
    nb = n // rays
    k_blk = np.zeros((nb,), dtype=np.int32)
    need_a = np.zeros((nb,), dtype=np.int32)
    need_b = np.zeros((nb,), dtype=np.int32)
    lib.bp_plan_stats_raw(
        s, e, n, int(rays), int(S), int(ngrp),
        np.ascontiguousarray(pbins, dtype=np.float64).reshape(3),
        np.ascontiguousarray(perm, dtype=np.int32).reshape(3),
        int(bool(flip)),
        np.ascontiguousarray(bmin, dtype=np.float64).reshape(3),
        float(ext), float(slack), float(eps),
        k_blk, need_a, need_b,
    )
    return k_blk, need_a, need_b
