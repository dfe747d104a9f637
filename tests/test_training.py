"""Training pipeline: sample generation on the mock scene, batch providers,
pretraining step convergence, end-to-end RayNet training step (incl.
trainable gamma).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raynet_tpu.common.dataset import RestrepoDataset
from raynet_tpu.common.generation_parameters import (
    GenerationParameters,
    get_target_distribution_factory,
)
from raynet_tpu.common.sampling_schemes import get_sampling_scheme
from raynet_tpu.train.sample import (
    DefaultSampleGenerator,
    RayNetRandomSampleGenerator,
)
from raynet_tpu.train.batch_provider import (
    BatchProvider,
    RayNetBatchProvider,
)
from raynet_tpu.train.pretrain import create_pretrain_state, make_pretrain_step
from raynet_tpu.train.train_e2e import build_end_to_end_training


@pytest.fixture(scope="module")
def gp():
    return GenerationParameters(
        depth_planes=4,
        neighbors=4,
        patch_shape=(11, 11, 3),  # must cover simple_cnn's rf of 11
        grid_shape=np.array([8, 8, 8], dtype=np.int32),
        max_number_of_marched_voxels=16,
        padding=11,
        sampling_type="sample_points_in_bbox",
        target_distribution_factory=get_target_distribution_factory("dirac"),
        gamma_mrf=0.031,
    )


def _input_shapes(gp, n_pairs=10):
    d = gp.depth_planes
    return [(d, n_pairs) + tuple(gp.patch_shape)] * 2, [(d,)]


def test_default_sample_generator(mock_scene_dir, gp):
    dataset = RestrepoDataset(str(mock_scene_dir.parent))
    scheme = get_sampling_scheme("sample_in_bbox")(gp)
    in_shapes, out_shapes = _input_shapes(gp)
    sg = DefaultSampleGenerator(
        scheme, gp, [0], in_shapes, out_shapes, rng=np.random.RandomState(3)
    )
    # Draw until a valid sample appears (rejection is expected behavior).
    for _ in range(200):
        s = sg.get_sample(dataset)
        if s.X is not None:
            break
    assert s.X is not None, "no valid sample in 200 draws"
    assert len(s.X) == 2
    assert s.X[0].shape == (gp.depth_planes, 10) + tuple(gp.patch_shape)
    assert s.y[0].shape == (gp.depth_planes,)
    np.testing.assert_allclose(s.y[0].sum(), 1.0)


def test_batch_provider(mock_scene_dir, gp):
    dataset = RestrepoDataset(str(mock_scene_dir.parent))
    scheme = get_sampling_scheme("sample_in_bbox")(gp)
    in_shapes, out_shapes = _input_shapes(gp)
    sg = DefaultSampleGenerator(
        scheme, gp, [0], in_shapes, out_shapes, rng=np.random.RandomState(4)
    )
    bp = BatchProvider(dataset, sg, cache_size=8, batch_size=4)
    try:
        assert bp.ready(timeout=120)
        X, y = next(iter(bp))
        assert X[0].shape == (4,) + tuple(in_shapes[0])
        assert y[0].shape == (4, gp.depth_planes)
    finally:
        bp.stop()


def _raynet_batch(mock_scene_dir, gp, n=3):
    dataset = RestrepoDataset(str(mock_scene_dir.parent))
    scheme = get_sampling_scheme("sample_in_bbox")(gp)
    in_shapes, out_shapes = _input_shapes(gp)
    sg = RayNetRandomSampleGenerator(
        scheme, gp, [0], in_shapes, out_shapes, window=2,
        rng=np.random.RandomState(5),
    )
    provider = RayNetBatchProvider(dataset, sg)
    return provider.get_batch_of_rays(n)


def test_raynet_sample_and_batch(mock_scene_dir, gp):
    batch = _raynet_batch(mock_scene_dir, gp)
    assert batch["X"].shape == (5, 3, gp.depth_planes) + tuple(gp.patch_shape)
    assert batch["points"].shape == (3, gp.depth_planes, 4)
    assert batch["ray_voxel_indices"].shape == (3, 16, 3)
    assert np.all(batch["ray_voxel_count"] >= 1)
    np.testing.assert_allclose(batch["y"].sum(-1), 1.0)


def test_multithread_provider_matches_layout_and_scene(mock_scene_dir, gp):
    from raynet_tpu.train.batch_provider import MultiThreadRayNetBatchProvider

    dataset = RestrepoDataset(str(mock_scene_dir.parent))
    scheme = get_sampling_scheme("sample_in_bbox")(gp)
    in_shapes, out_shapes = _input_shapes(gp)
    sg = RayNetRandomSampleGenerator(
        scheme, gp, [0], in_shapes, out_shapes, window=2,
        rng=np.random.RandomState(6),
    )
    provider = MultiThreadRayNetBatchProvider(dataset, sg, n_workers=3)
    batch = provider.get_batch_of_rays(6)
    assert batch["X"].shape == (5, 6, gp.depth_planes) + tuple(gp.patch_shape)
    assert np.all(batch["ray_voxel_count"] >= 1)
    np.testing.assert_allclose(batch["y"].sum(-1), 1.0)
    assert batch["scene_idx"] == 0


def test_multithread_provider_draws_concurrently(mock_scene_dir, gp):
    """The expensive per-sample draw must overlap across workers (round 1
    held a lock around the whole draw and was serial in practice)."""
    import threading
    import time

    from raynet_tpu.train.batch_provider import MultiThreadRayNetBatchProvider
    from raynet_tpu.train.sample import RayNetRandomSampleGenerator

    dataset = RestrepoDataset(str(mock_scene_dir.parent))
    scheme = get_sampling_scheme("sample_in_bbox")(gp)
    in_shapes, out_shapes = _input_shapes(gp)

    gauge = {"cur": 0, "max": 0}
    glock = threading.Lock()

    class SlowGenerator(RayNetRandomSampleGenerator):
        def _get_sample(self, scene, scene_idx, img_idx):
            with glock:
                gauge["cur"] += 1
                gauge["max"] = max(gauge["max"], gauge["cur"])
            time.sleep(0.05)  # a synthetic slow draw (e.g. image IO)
            try:
                return super()._get_sample(scene, scene_idx, img_idx)
            finally:
                with glock:
                    gauge["cur"] -= 1

    sg = SlowGenerator(
        scheme, gp, [0], in_shapes, out_shapes, window=2,
        rng=np.random.RandomState(7),
    )
    provider = MultiThreadRayNetBatchProvider(dataset, sg, n_workers=4)
    provider.get_batch_of_rays(8)
    assert gauge["max"] >= 2, (
        "draws never overlapped: the provider is serial (max concurrency %d)"
        % gauge["max"]
    )


def test_pretrain_step_reduces_loss(rng):
    b, d, n, h, w, c = 4, 4, 3, 11, 11, 1
    model, state, loss_fn, wd = create_pretrain_state(
        jax.random.PRNGKey(0), (d, n, h, w, c), lr=5e-3
    )
    train_step, eval_step = make_pretrain_step(model, loss_fn, wd)

    x1 = jnp.asarray(rng.rand(b, d, n, h, w, c), jnp.float32)
    x2 = jnp.asarray(rng.rand(b, d, n, h, w, c), jnp.float32)
    y = np.zeros((b, d), dtype=np.float32)
    y[np.arange(b), rng.randint(0, d, b)] = 1.0
    y = jnp.asarray(y)

    first = None
    for i in range(30):
        state, metrics = train_step(state, x1, x2, y)
        if first is None:
            first = float(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < first

    em = eval_step(state, x1, x2, y)
    assert np.isfinite(float(em["loss"]))


def test_end_to_end_training_step(mock_scene_dir, gp):
    batch = _raynet_batch(mock_scene_dir, gp)
    batch = {
        k: jnp.asarray(v) for k, v in batch.items() if k != "scene_idx"
    }

    state, train_fn, eval_fn = build_end_to_end_training(
        jax.random.PRNGKey(0),
        gp,
        gp.grid_shape,
        lr=1e-3,
        gamma=0.031,
        train_with_gamma=True,
        bp_iterations=2,
    )
    g0 = float(state.params["gamma"])
    losses = []
    for _ in range(5):
        state, metrics = train_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # it learns on a fixed batch
    assert float(state.params["gamma"]) != g0  # gamma is trainable
    assert 1e-5 <= float(state.params["gamma"]) <= 1 - 1e-5

    em = eval_fn(state, batch)
    assert np.isfinite(float(em["loss"]))


def test_textured_quality_scene_learnable():
    """The training-quality bench's synthetic scene must carry signal:
    the quad fills the frame (non-trivial image energy) and the sample
    pipeline accepts a usable fraction of draws with concentrated
    dirac targets (tools/bench_training_quality feeds bench.py's
    pretrain_val_acc/val_mde metrics)."""
    import tempfile

    from tools.bench_training_quality import make_textured_scene
    from raynet_tpu.common.dataset import RestrepoDataset
    from raynet_tpu.common.generation_parameters import (
        GenerationParameters, get_target_distribution_factory,
    )
    from raynet_tpu.common.sampling_schemes import get_sampling_scheme
    from raynet_tpu.scripts.arguments import default_input_output_shape
    from raynet_tpu.train.sample import DefaultSampleGenerator

    root = tempfile.mkdtemp(prefix="quality_scene_test_")
    make_textured_scene(root + "/scene_1")
    ds = RestrepoDataset(root)
    scene = ds.get_scene(0)
    im = scene.get_image(2)
    assert im.image.std() > 0.15, "texture missing"
    assert im.image.mean() > 0.1, "quad does not fill the frame"

    gp = GenerationParameters(
        depth_planes=8, neighbors=4, patch_shape=(11, 11, 3),
        grid_shape=np.array([12, 12, 12], np.int32),
        max_number_of_marched_voxels=24, padding=11,
        target_distribution_factory=get_target_distribution_factory(
            "dirac", 1.0, False
        ),
    )
    scheme = get_sampling_scheme("sample_in_bbox")(gp)
    ins, outs = default_input_output_shape(gp)
    sg = DefaultSampleGenerator(
        scheme, gp, [0], ins, outs, rng=np.random.RandomState(0)
    )
    ok = 0
    for _ in range(60):
        s = sg.get_sample(ds)
        if s.X is not None:
            ok += 1
            assert s.X[0].shape == ins[0]
            assert np.isclose(s.y[0].sum(), 1.0)
    assert ok >= 12, "acceptance rate collapsed: %d/60" % ok
