"""End-to-end inference on the synthesized mock scene: every forward-pass
factory produces depth maps of the right shape with depths inside the scene's
plausible range; the raynet factory's BP must not destroy the MVCNN signal.
"""
import numpy as np
import pytest

from raynet_tpu.common.scene import RestrepoScene
from raynet_tpu.common.generation_parameters import GenerationParameters
from raynet_tpu.common.sampling_schemes import get_sampling_scheme
from raynet_tpu.inference import get_forward_pass_factory
from raynet_tpu.models.feature_extractor import FeatureExtractor
from conftest import MOCK_H as H, MOCK_W as W


@pytest.fixture(scope="module")
def setup(mock_scene_dir):
    scene = RestrepoScene(str(mock_scene_dir))
    gp = GenerationParameters(
        depth_planes=8,
        neighbors=4,
        patch_shape=(11, 11, 3),
        grid_shape=np.array([16, 16, 16], dtype=np.int32),
        max_number_of_marched_voxels=32,
        padding=11,
        sampling_type="sample_points_in_bbox",
        gamma_mrf=0.05,
    )
    model = FeatureExtractor("simple_cnn", seed=0)
    scheme = get_sampling_scheme("sample_in_bbox")(gp)
    return scene, gp, model, scheme


def _run(factory_name, setup, rays_batch=W * H):
    scene, gp, model, scheme = setup
    fp = get_forward_pass_factory(factory_name)(
        model, gp, scheme, scene.image_shape, rays_batch
    )
    maps = list(fp.forward_pass(scene, (0, 2, 1)))
    assert len(maps) == 2
    for dm in maps:
        assert dm.shape == (H, W)
        assert np.all(np.isfinite(dm))
    return maps


def test_multi_view_cnn_forward_pass(setup):
    maps = _run("multi_view_cnn", setup)
    # depths must lie between camera-to-bbox entry and exit (~14.5 .. ~26)
    assert maps[0].min() >= 10.0
    assert maps[0].max() <= 30.0


def test_multi_view_cnn_with_odd_batches(setup):
    # rays_batch that does not divide H*W exercises the padded last batch
    maps = _run("multi_view_cnn", setup, rays_batch=700)
    ref = _run("multi_view_cnn", setup)
    np.testing.assert_allclose(maps[0], ref[0], rtol=1e-5)


def test_multi_view_cnn_voxel_space_forward_pass(setup):
    maps = _run("multi_view_cnn_voxel_space", setup)
    nz = maps[0][maps[0] > 0]
    assert nz.size > 0.5 * maps[0].size
    assert nz.min() >= 10.0 and nz.max() <= 30.0


def test_raynet_forward_pass(setup):
    maps = _run("raynet", setup)
    nz = maps[0][maps[0] > 0]
    assert nz.size > 0.5 * maps[0].size
    assert nz.min() >= 10.0 and nz.max() <= 30.0


def test_raynet_with_odd_batches(setup):
    """ADVICE r1 (high): a rays_batch that does not divide H*W pads the last
    chunk with duplicates of ray 0; those rows must NOT be scattered into the
    global occupancy accumulator (they inflated the grid 8.2 -> 226.5
    log-odds before the n_valid mask)."""
    maps = _run("raynet", setup, rays_batch=700)
    ref = _run("raynet", setup)
    np.testing.assert_allclose(maps[0], ref[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(maps[1], ref[1], rtol=1e-4, atol=1e-5)


def test_raynet_multichip_matches_single_device(setup):
    """With 8 virtual CPU devices and rays_batch divisible by 8, the raynet
    factory auto-shards the ray axis; depth maps must match the forced
    single-device run (VERDICT r1 #5: multi-chip inference reachable from
    the orchestrator, not just the parallel module)."""
    scene, gp, model, scheme = setup
    import jax

    assert len(jax.devices()) == 8  # conftest virtual mesh

    fp = get_forward_pass_factory("raynet")(
        model, gp, scheme, scene.image_shape, W * H
    )
    assert fp._sharded_steps(H, W, gp, tuple(int(g) for g in gp.grid_shape),
                             gp.max_number_of_marched_voxels) is not None
    sharded_maps = list(fp.forward_pass(scene, (0, 2, 1)))

    fp_single = get_forward_pass_factory("raynet")(
        model, gp, scheme, scene.image_shape, W * H
    )
    fp_single.multichip = "off"
    single_maps = list(fp_single.forward_pass(scene, (0, 2, 1)))

    for a, b in zip(sharded_maps, single_maps):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_raynet_float16_messages(setup):
    """float16 host-side message storage (the DTU-scale memory plan)
    reproduces the float32 depth maps within tie tolerance."""
    scene, gp, model, scheme = setup
    ref = _run("raynet", setup)

    fp = get_forward_pass_factory("raynet")(
        model, gp, scheme, scene.image_shape, W * H
    )
    fp.messages_dtype = np.float16
    maps = list(fp.forward_pass(scene, (0, 2, 1)))
    for a, b in zip(maps, ref):
        close = np.isclose(a, b, rtol=1e-3, atol=1e-3)
        assert close.mean() > 0.995, close.mean()


def test_raynet_cached_scores_match(setup):
    """The per-image plane-score cache (computed on sweep 1, reused by
    sweeps 2..4) must reproduce the recompute-every-sweep depth maps
    exactly: the scores are message-independent by construction."""
    ref = _run("raynet", setup, rays_batch=700)

    scene, gp, model, scheme = setup
    fp = get_forward_pass_factory("raynet")(
        model, gp, scheme, scene.image_shape, 700
    )
    # The budget check requires a TPU backend; force the cache on CPU.
    fp._messages_on_device = lambda *a, **k: True
    maps = list(fp.forward_pass(scene, (0, 2, 1)))
    for a, b in zip(maps, ref):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_negative_encoded_pad_rays_masked(setup):
    """Tile-run pad entries (-(ray+1)) must contribute NOTHING to the BP
    scatter and produce zero messages — a plain duplicate ray would be
    double-counted (the round-1 padded-scatter bug class)."""
    import jax.numpy as jnp
    from raynet_tpu.ops import fused

    scene, gp, model, scheme = setup
    im = scene.get_image(0)
    feats = model.predict(
        np.zeros((5, H + 2 * gp.padding, W + 2 * gp.padding, 3), np.float32)
    )
    P = jnp.asarray(np.stack([im.camera.P] * 5), jnp.float32)
    P_pinv = jnp.asarray(im.camera.P_pinv, jnp.float32)
    center = jnp.asarray(im.camera.center[:3, 0], jnp.float32)
    bbox = jnp.asarray(scene.bbox.reshape(-1), jnp.float32)
    grid_shape = (16, 16, 16)
    m = 32
    g = int(np.prod(grid_shape))
    n = 256

    base = np.arange(n, dtype=np.int32)
    msgs = jnp.zeros((n, m), jnp.float32)
    acc = jnp.full((g,), -3.0, jnp.float32)

    # reference: half the rays valid via n_valid
    ref_msgs, ref_scatter, _ = fused.raynet_message_step(
        jnp.asarray(base), feats, P, P_pinv, center, bbox, msgs, acc,
        jnp.int32(128), H, W, gp.padding, gp.depth_planes, grid_shape, m,
    )
    # same rays, but rows 128.. are negative-encoded pads (all "valid"
    # by count): scatter and messages must match the n_valid reference
    enc = base.copy()
    enc[128:] = -enc[128:] - 1
    out_msgs, out_scatter, _ = fused.raynet_message_step(
        jnp.asarray(enc), feats, P, P_pinv, center, bbox, msgs, acc,
        jnp.int32(n), H, W, gp.padding, gp.depth_planes, grid_shape, m,
    )
    np.testing.assert_allclose(
        np.asarray(out_scatter), np.asarray(ref_scatter),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(out_msgs), np.asarray(ref_msgs), rtol=1e-6, atol=1e-7
    )
    assert np.all(np.asarray(out_msgs)[128:] == 0)


def test_pad_tile_runs_blocks_tight(setup):
    """_pad_tile_runs: every 128-block of the padded list touches only
    adjacent tiles, pads decode to the preceding ray, inflation is small."""
    from raynet_tpu.inference.forward_pass import ForwardPass
    from raynet_tpu.ops.pallas.planesweep import TILE_W, TILE_H

    h = 64
    rng = np.random.RandomState(0)
    idxs = np.arange(h * 96, dtype=np.int32)
    # synthetic mask with a hole -> tile discontinuities
    x = idxs // h
    y = idxs % h
    keep = ~((x > 30) & (x < 60) & (y > 10) & (y < 50))
    kept = idxs[keep]
    # tile-sort
    tile = (x[kept] // TILE_W) * ((h + TILE_H - 1) // TILE_H) + (
        y[kept] // TILE_H
    )
    kept = kept[np.argsort(tile, kind="stable")]

    padded = ForwardPass._pad_tile_runs(kept, h)
    assert len(padded) < len(kept) * 1.35, "pad inflation too large"
    dec = np.where(padded < 0, -padded - 1, padded)
    # valid entries preserved in order
    np.testing.assert_array_equal(dec[padded >= 0], kept)
    # per 128-block: decoded rays walk CONSECUTIVE tiles (no gaps — a
    # gap is exactly what blows the static band/beam boxes)
    nb = len(padded) // 128
    for b in range(nb):
        blk = dec[b * 128 : (b + 1) * 128]
        t = (blk // h // TILE_W) * ((h + TILE_H - 1) // TILE_H) + (
            blk % h
        ) // TILE_H
        assert np.all(np.diff(t) <= 1), (b, t.min(), t.max())


def test_forward_pass_reuse_across_scenes(setup, tmp_path):
    """Reusing one ForwardPass on a DIFFERENT scene must not serve the
    first scene's cached features/cameras/plans (review finding r2)."""
    import shutil
    import imageio.v2 as imageio

    scene, gp, model, scheme = setup
    fp = get_forward_pass_factory("multi_view_cnn")(
        model, gp, scheme, scene.image_shape, W * H
    )
    m1 = next(iter(fp.forward_pass(scene, (0, 1, 1))))

    # scene B: same directory layout but every camera shifted -> different
    # geometry; a stale cache would reproduce scene A's map exactly
    src = scene._basepath
    dst = tmp_path / "scene_b"
    shutil.copytree(src, dst)
    for f in sorted((dst / "cams_krt").iterdir()):
        rows = f.read_text().strip().split("\n")
        t = [float(v) for v in rows[-1].split()]
        t[0] += 1.5  # shift the camera
        rows[-1] = " ".join("%.9g" % v for v in t)
        f.write_text("\n".join(rows) + "\n")
    scene_b = RestrepoScene(str(dst))
    m2 = next(iter(fp.forward_pass(scene_b, (0, 1, 1))))
    assert not np.allclose(m1, m2), "stale per-scene caches"

    # and back to scene A: must reproduce the original map
    m3 = next(iter(fp.forward_pass(scene, (0, 1, 1))))
    np.testing.assert_allclose(m1, m3, rtol=1e-6)


def test_host_staged_messages_match(setup):
    """The host-staged path (per-image upload -> single-dispatch scan ->
    download, the DTU-scale storage plan) must reproduce the per-batch
    host path's depth maps."""
    ref = _run("raynet", setup, rays_batch=700)

    scene, gp, model, scheme = setup
    fp = get_forward_pass_factory("raynet")(
        model, gp, scheme, scene.image_shape, 700
    )
    fp.force_host_staging = True
    maps = list(fp.forward_pass(scene, (0, 2, 1)))
    for a, b in zip(maps, ref):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_filter_with_empty_gt_image(setup, monkeypatch):
    """An image whose GT depth map is all zero has NO valid rays under
    filter_out_rays; the forward pass must yield an all-zero map for it
    (and not crash in batch/band planning — review finding r2)."""
    scene, gp, model, scheme = setup
    fp = get_forward_pass_factory("raynet")(
        model, gp, scheme, scene.image_shape, 700, filter_out_rays=True
    )
    fp._messages_on_device = lambda *a, **k: True  # force device path
    orig = scene.get_depth_map

    def fake(i):
        if i == 1:
            return np.zeros(scene.image_shape, np.float32)
        return orig(i)

    monkeypatch.setattr(scene, "get_depth_map", fake)
    maps = list(fp.forward_pass(scene, (0, 2, 1)))
    assert np.all(maps[1] == 0)
    assert np.isfinite(maps[0]).all()
    assert (maps[0] > 0).any()


def test_filter_out_rays(setup, mock_scene_dir):
    """filter_out_rays restricts prediction to nonzero-GT pixels."""
    scene, gp, model, scheme = setup
    from raynet_tpu.inference import get_forward_pass_factory
    import numpy as np

    fp = get_forward_pass_factory("multi_view_cnn")(
        model, gp, scheme, scene.image_shape, W * H, filter_out_rays=True
    )
    dm = next(iter(fp.forward_pass(scene, (0, 1, 1))))
    gt = scene.get_depth_map(0)
    assert dm.shape == (H, W)
    # pixels without GT stay zero; pixels with GT get predictions
    assert np.all(dm[gt == 0] == 0)
    assert np.all(dm[gt != 0] > 0)


def test_coalesce_band_specs_mixed_view_counts():
    """Edge images with fewer neighbors must still coalesce: one unified
    spec per (n_views) GROUP instead of bailing scene-wide and
    reintroducing the per-image recompile hazard (VERDICT r2 #7)."""
    from raynet_tpu.inference.forward_pass import _coalesce_band_specs

    specs = {
        0: ((16, 16), (16, 32), (24, 32)),
        1: ((8, 32), (32, 16), (16, 48)),
        2: ((16, 16), (8, 64)),  # edge image: one fewer neighbor
        3: None,  # planner-rejected image keeps the XLA path
    }
    out = _coalesce_band_specs(specs)
    assert out[0] == out[1] == ((16, 32), (32, 32), (24, 48))
    assert out[2] == ((16, 16), (8, 64))
    assert out[3] is None


def test_raynet_sharded_scan_matches_single_device(setup):
    """The sharded SINGLE-DISPATCH per-(image, sweep) scan (one psum per
    image-sweep; VERDICT r2 #2) must reproduce the single-device depth
    maps on the 8-device virtual mesh."""
    scene, gp, model, scheme = setup
    import jax

    assert len(jax.devices()) == 8  # conftest virtual mesh

    fp = get_forward_pass_factory("raynet")(
        model, gp, scheme, scene.image_shape, W * H
    )
    # CPU has no device budget; force the scan path on the virtual mesh
    fp._messages_on_device = lambda *a, **k: True
    assert fp._sharded_steps(
        H, W, gp, tuple(int(g) for g in gp.grid_shape),
        gp.max_number_of_marched_voxels,
    ) is not None
    sharded_maps = list(fp.forward_pass(scene, (0, 2, 1)))

    fp_single = get_forward_pass_factory("raynet")(
        model, gp, scheme, scene.image_shape, W * H
    )
    fp_single.multichip = "off"
    fp_single._messages_on_device = lambda *a, **k: True
    single_maps = list(fp_single.forward_pass(scene, (0, 2, 1)))

    for a, b in zip(sharded_maps, single_maps):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_snap_rays_batch_minimizes_pad():
    """The scene-level batch snap picks the 512-multiple with the least
    total ceil-padding (DTU's 921,600-ray images: 61,440 divides them
    exactly vs 6.7% pad at 65,536), and leaves non-512-multiple requests
    and the sharded path untouched."""
    from raynet_tpu.inference.forward_pass import ForwardPass

    fp = ForwardPass.__new__(ForwardPass)
    fp.rays_batch = 65536
    assert fp._snap_rays_batch([921600, 921600], None) == 61440
    # the snap derives from the REQUESTED size even when rays_batch
    # currently holds a previous scene's snapped value
    fp._rays_batch_requested = 65536
    fp.rays_batch = 61440
    assert fp._snap_rays_batch([65536 * 3], None) == 65536

    fp2 = ForwardPass.__new__(ForwardPass)
    fp2.rays_batch = 700  # not a 512 multiple: untouched
    assert fp2._snap_rays_batch([1728], None) == 700

    fp3 = ForwardPass.__new__(ForwardPass)
    fp3.rays_batch = 65536
    assert fp3._snap_rays_batch([921600], {"n_dev": 8}) == 65536


def test_host_staged_filtered_messages_match(setup):
    """Host staging x GT ray filtering (the real full-DTU single-chip
    configuration): staged stores over tile-run-padded filtered ray
    lists must reproduce the unstaged filtered run's depth maps."""
    scene, gp, model, scheme = setup
    ref_fp = get_forward_pass_factory("raynet")(
        model, gp, scheme, scene.image_shape, 700, filter_out_rays=True
    )
    ref = list(ref_fp.forward_pass(scene, (0, 2, 1)))

    fp = get_forward_pass_factory("raynet")(
        model, gp, scheme, scene.image_shape, 700, filter_out_rays=True
    )
    fp.force_host_staging = True
    maps = list(fp.forward_pass(scene, (0, 2, 1)))
    for a, b in zip(maps, ref):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_raynet_multichip_filtered_matches_single_device(setup):
    """Sharded orchestration x GT ray filtering: the auto-sharded run
    over a tile-run-padded filtered ray list must match the forced
    single-device filtered run."""
    scene, gp, model, scheme = setup
    import jax

    assert len(jax.devices()) == 8  # conftest virtual mesh

    fp = get_forward_pass_factory("raynet")(
        model, gp, scheme, scene.image_shape, W * H, filter_out_rays=True
    )
    assert fp._sharded_steps(
        H, W, gp, tuple(int(g) for g in gp.grid_shape),
        gp.max_number_of_marched_voxels,
    ) is not None
    sharded_maps = list(fp.forward_pass(scene, (0, 2, 1)))

    fp_single = get_forward_pass_factory("raynet")(
        model, gp, scheme, scene.image_shape, W * H, filter_out_rays=True
    )
    fp_single.multichip = "off"
    single_maps = list(fp_single.forward_pass(scene, (0, 2, 1)))

    for a, b in zip(sharded_maps, single_maps):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_per_image_feature_dedup(setup):
    """Overlapping view sets must compute each image's CNN features ONCE
    (per-image cache): two consecutive reference views share 4 of their
    5 images, so 2 sets cost at most images+neighbors unique predicts —
    the DTU cold-feature phase scales with ~53 unique images, not
    49 x 5 views."""
    scene, gp, model, scheme = setup
    fp = get_forward_pass_factory("raynet")(
        model, gp, scheme, scene.image_shape, W * H
    )
    calls = []
    orig_predict = model.predict

    def counting_predict(images):
        calls.append(np.asarray(images).shape)
        return orig_predict(images)

    model.predict = counting_predict
    try:
        f0 = fp._features_and_cameras(scene, 0)[0]
        f1 = fp._features_and_cameras(scene, 1)[0]
    finally:
        model.predict = orig_predict
    uniq = {
        j
        for i in (0, 1)
        for j in scene.get_view_idxs(i, gp.neighbors)
    }
    assert len(calls) == len(uniq)
    assert all(s[0] == 1 for s in calls)  # per-image predicts
    # the stacks are per-view-set assemblies of the shared maps
    v0 = scene.get_view_idxs(0, gp.neighbors)
    v1 = scene.get_view_idxs(1, gp.neighbors)
    shared0 = [k for k, j in enumerate(v0) if j in v1]
    assert shared0, "mock scene view sets should overlap"
    k0 = shared0[0]
    k1 = v1.index(v0[k0])
    np.testing.assert_array_equal(
        np.asarray(f0[k0]), np.asarray(f1[k1])
    )


@pytest.mark.slow
def test_classes_with_filtered_rays_match_single_config(setup):
    """Per-block box classes x GT ray filtering on the device-fast scan
    (both DEFAULT-ON in production): the class-reordered two-segment run
    must reproduce the single-config run. Runs the real beam kernel in
    interpret mode; the forced same-config split isolates the reorder /
    segment machinery under tile-run-padded (negative-encoded) lists."""
    import raynet_tpu.inference.forward_pass as fpm
    from jax.experimental.pallas import tpu as pltpu

    scene, gp, model, scheme = setup

    def forced_classes(self, scene_, ref_idx, ray_idxs, shards=1):
        from raynet_tpu.ops.pallas.bp_beam import plan_bp_config

        _, P, P_pinv, center = self._feature_cache[ref_idx]
        H, W = scene_.image_shape
        cfg = plan_bp_config(
            np.asarray(P_pinv), np.asarray(center),
            scene_.bbox.reshape(-1), gp.grid_shape, H, W,
            gp.depth_planes, gp.max_number_of_marched_voxels,
            gamma=0.05, rays=256, ray_idxs=ray_idxs,
        )
        assert cfg is not None, "planner rejected the mock geometry"
        mask = np.zeros(64, bool)
        mask[::2] = True  # interleaved small/large blocks
        return dict(cfg_large=cfg, cfg_small=cfg, small_mask=mask)

    old_classes = fpm.RayNetForwardPass._bp_classes
    old_pallas = fpm._use_pallas
    fpm._use_pallas = lambda: True
    try:
        with pltpu.force_tpu_interpret_mode():
            fpm.RayNetForwardPass._bp_classes = forced_classes
            fp = get_forward_pass_factory("raynet")(
                model, gp, scheme, scene.image_shape, 512,
                filter_out_rays=True,
            )
            fp._band_specs = lambda *a, **k: None  # XLA sims: test beams
            fp.bp_iterations = 1
            # 8 virtual devices: interpret-mode pallas deadlocks under
            # shard_map+scan (CLAUDE.md landmine) — force single device
            fp.multichip = "off"
            maps_cls = list(fp.forward_pass(scene, (0, 2, 1)))
            okey = list(fp._orch_cache)[0]
            seg_data = fp._orch_cache[okey][20]
            assert any(len(v) == 2 for v in seg_data.values())

            fpm.RayNetForwardPass._bp_classes = old_classes
            fp1 = get_forward_pass_factory("raynet")(
                model, gp, scheme, scene.image_shape, 512,
                filter_out_rays=True,
            )
            fp1._band_specs = lambda *a, **k: None
            fp1.bp_iterations = 1
            fp1.bp_classes = "off"
            fp1.multichip = "off"
            maps_one = list(fp1.forward_pass(scene, (0, 2, 1)))
    finally:
        fpm.RayNetForwardPass._bp_classes = old_classes
        fpm._use_pallas = old_pallas

    for a, b in zip(maps_cls, maps_one):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def _run_filtered_scan_shapes(setup, bp_beam):
    """GT filtering gives every image a different valid-ray count; the
    orchestrator must pad each image's class segments to scene-wide
    chunk-count targets so ALL images share one compiled scan per
    (cfg, kind) — each distinct chunk shape is its own 30-150 s remote
    compile on the TPU toolchain."""
    import raynet_tpu.inference.forward_pass as fpm
    from jax.experimental.pallas import tpu as pltpu

    scene, gp, model, scheme = setup
    old_pallas = fpm._use_pallas
    fpm._use_pallas = lambda: True
    try:
        with pltpu.force_tpu_interpret_mode():
            fp = get_forward_pass_factory("raynet")(
                model, gp, scheme, scene.image_shape, 512,
                filter_out_rays=True,
            )
            fp._band_specs = lambda *a, **k: None
            fp.bp_iterations = 1
            fp.bp_beam = bp_beam
            fp.multichip = "off"  # interpret x shard_map deadlocks
            maps = list(fp.forward_pass(scene, (0, 2, 1)))
    finally:
        fpm._use_pallas = old_pallas

    # different raw valid counts...
    v0 = len(fp.get_valid_rays_per_image(scene, 0))
    v1 = len(fp.get_valid_rays_per_image(scene, 1))
    assert v0 != v1, "mock scene should give differing valid counts"
    # ...but identical padded segment shapes scene-wide
    okey = list(fp._orch_cache)[0]
    seg_data = fp._orch_cache[okey][20]
    shapes = {
        i: [(seg[3].shape, seg[4].shape) for seg in segs]
        for i, segs in seg_data.items()
    }
    assert shapes[0] == shapes[1], shapes
    for m in maps:
        assert np.isfinite(m).all()
        assert (m > 0).any()


def test_filtered_images_share_scan_shapes(setup):
    """Chunk-count unification with the XLA scan body (fast always-on
    case; the padding/grouping code is cfg-independent)."""
    _run_filtered_scan_shapes(setup, bp_beam="off")


@pytest.mark.slow
def test_filtered_images_share_scan_shapes_beam(setup):
    """Same contract through the interpret-mode beam-kernel segments
    (class reorder + small/large segment split)."""
    _run_filtered_scan_shapes(setup, bp_beam="auto")


def test_unfiltered_ray_order_cached_per_shape(setup):
    """Unfiltered valid-ray lists are image-independent (arange + tile
    argsort), so the order must be computed once per image SHAPE and
    shared across views/scenes (a ~1M-row argsort per view was ~20 s of
    the extrapolated cold DTU plan cost). The cached master is frozen;
    downstream pad/reorder steps must keep copying."""
    import raynet_tpu.inference.forward_pass as fpm
    from raynet_tpu.inference import get_forward_pass_factory

    scene, gp, model, scheme = setup
    old_pallas = fpm._use_pallas
    fpm._use_pallas = lambda: True
    try:
        fpm._UNFILTERED_RAY_ORDER.clear()
        fp = get_forward_pass_factory("raynet")(
            model, gp, scheme, scene.image_shape, 512,
        )
        a = fp.get_valid_rays_per_image(scene, 0)
        b = fp.get_valid_rays_per_image(scene, 1)
        assert a is b  # one cached master per shape
        assert not a.flags.writeable
        assert len(fpm._UNFILTERED_RAY_ORDER) == 1
        # same content as an uncached tile sort
        H = scene.image_shape[0]
        ref = fp._tile_sort(
            np.arange(np.prod(scene.image_shape), dtype=np.int32), H
        )
        np.testing.assert_array_equal(a, ref)
    finally:
        fpm._use_pallas = old_pallas
        fpm._UNFILTERED_RAY_ORDER.clear()


def test_vmem_compile_failure_falls_back_to_xla(setup):
    """A Mosaic scoped-VMEM compile failure surfaces at the FIRST fused
    dispatch — after planning, before any depth map is yielded. The
    forward_pass wrapper must retry the whole pass once with the beam
    kernel off (ADVICE r4: est_scoped_vmem is a calibrated fast-path
    filter, not a guarantee) and restore bp_beam afterwards."""
    from raynet_tpu.inference.forward_pass import RayNetForwardPass

    scene, gp, model, scheme = setup
    fp = RayNetForwardPass(model, gp, scheme, scene.image_shape, 512)
    calls = []

    def fake_planned(scene_, images_range):
        calls.append(fp.bp_beam)
        if fp.bp_beam != "off":
            raise RuntimeError(
                "Mosaic failed to compile TPU kernel: scoped vmem "
                "allocation exceeds the limit"
            )
        yield np.zeros(scene_.image_shape, np.float32)

    fp._forward_pass_planned = fake_planned
    maps = list(fp.forward_pass(scene, (0, 1, 1)))
    assert len(maps) == 1
    assert calls == ["auto", "off"]
    assert fp.bp_beam == "auto"  # restored

    # non-VMEM errors must NOT be swallowed
    def fake_raise(scene_, images_range):
        raise RuntimeError("kernel planner invariant violated (3 ...)")
        yield  # pragma: no cover

    fp._forward_pass_planned = fake_raise
    with pytest.raises(RuntimeError, match="invariant"):
        list(fp.forward_pass(scene, (0, 1, 1)))


@pytest.mark.slow
def test_forward_pass_with_device_planner(setup, monkeypatch):
    """The orchestrated pass with the DEVICE planner march forced
    (RAYNET_DEVICE_PLANNER=1 — production default on an accelerator)
    must produce the same depth maps as the host-planner pass: the
    planners must derive identical configs end to end, including the
    class reorder and segment plumbing. Slow (2x interpret-mode beam
    sweeps); the always-on config-level parity lives in
    test_bp_beam.py::test_device_planner_matches_native and
    test_plan_prefetch_parity."""
    import raynet_tpu.inference.forward_pass as fpm
    from jax.experimental.pallas import tpu as pltpu

    scene, gp, model, scheme = setup
    old_pallas = fpm._use_pallas
    fpm._use_pallas = lambda: True
    try:
        with pltpu.force_tpu_interpret_mode():
            maps = {}
            for flag in ("1", "0"):
                monkeypatch.setenv("RAYNET_DEVICE_PLANNER", flag)
                fp = get_forward_pass_factory("raynet")(
                    model, gp, scheme, scene.image_shape, 512,
                )
                fp._band_specs = lambda *a, **k: None
                fp.bp_iterations = 1
                fp.multichip = "off"
                maps[flag] = list(fp.forward_pass(scene, (0, 1, 1)))
    finally:
        fpm._use_pallas = old_pallas
    for a, b in zip(maps["1"], maps["0"]):
        np.testing.assert_array_equal(a, b)


def test_chunk_seg_device_assembly():
    """_chunk_seg_to_device must reproduce the host chunk tensor
    bit-exactly from the committed tile-order base (block permutation +
    constant dead fills), and refuse anything else."""
    import raynet_tpu.inference.forward_pass as fpm

    H, W = 64, 64
    n = H * W
    key = None
    from raynet_tpu.ops.pallas import planesweep as _ps

    key = (H, W, _ps.TILE_W, _ps.TILE_H)
    rng = np.random.RandomState(0)
    base = rng.permutation(n).astype(np.int32)  # any order works
    fpm._UNFILTERED_RAY_ORDER[key] = base
    fpm._CHUNK_ASM_CACHE.pop(key, None)
    try:
        b = 1024
        blocks = base.reshape(-1, 256)          # 16 blocks
        perm = rng.permutation(len(blocks))
        dead = np.full((4, 256), -7, np.int32)  # one dead chunk
        chunks = np.concatenate([blocks[perm], dead]).reshape(-1, b)

        class Dummy:
            _filter_out_rays = False
        seg = fpm.RayNetForwardPass._chunk_seg_to_device(
            Dummy(), chunks, H, W
        )
        assert seg is not None
        got = np.asarray(seg(0, chunks.shape[0]))
        np.testing.assert_array_equal(got, chunks)
        got_tail = np.asarray(seg(1, chunks.shape[0]))
        np.testing.assert_array_equal(got_tail, chunks[1:])

        # a tensor that is NOT a block permutation must be refused
        bad = chunks.copy()
        bad[0, 3] = bad[0, 4]
        assert (
            fpm.RayNetForwardPass._chunk_seg_to_device(Dummy(), bad, H, W)
            is None
        )
        # non-constant dead block refused too
        bad2 = chunks.copy()
        bad2[-1, -1] = -9
        assert (
            fpm.RayNetForwardPass._chunk_seg_to_device(Dummy(), bad2, H, W)
            is None
        )
    finally:
        # a failed assert must not leave the random order installed for
        # the rest of the session (get_valid_rays_per_image serves it)
        fpm._UNFILTERED_RAY_ORDER.pop(key, None)
        fpm._CHUNK_ASM_CACHE.pop(key, None)
