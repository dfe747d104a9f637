"""Test configuration: force the CPU backend with 8 virtual devices so that
sharding/collective tests run without TPU hardware. Must run before any jax
import in the test session.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

import jax

# The axon sitecustomize force-selects the TPU platform via jax.config, which
# wins over the env var — override it back to CPU before any backend init.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated CPU compiles are identical across
# test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/raynet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (heavy interpret-mode equivalence "
             "cases; also enabled by RAYNET_RUN_SLOW=1)",
    )


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.slow by default (VERDICT r3 #4: default suite
    under 3 minutes). Each slow case is a WIDER sweep of a behavior that
    keeps an always-on fast representative; run the full matrix with
    --runslow before shipping kernel/orchestration changes."""
    if config.getoption("--runslow") or os.environ.get("RAYNET_RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(reason="slow: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


MOCK_H, MOCK_W = 36, 48


def _make_ring_camera(angle, h, w, radius=20.0):
    """Pinhole camera on a ring in the xz plane, looking at the origin."""
    K = np.array(
        [[400.0, 0, w / 2], [0, 400.0, h / 2], [0, 0, 1]], dtype=np.float32
    )
    c = np.array([radius * np.sin(angle), 0.0, -radius * np.cos(angle)])
    z = -c / np.linalg.norm(c)
    x = np.cross(np.array([0.0, 1.0, 0.0]), z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z]).astype(np.float32)
    t = (-R @ c.reshape(3, 1)).astype(np.float32)
    return K, R, t


@pytest.fixture(scope="session")
def mock_scene_dir(tmp_path_factory):
    """A synthesized Restrepo-format scene: 6 ring cameras around a textured
    quad at z=0, with GT mesh for octree depth queries."""
    import imageio.v2 as imageio

    h, w = MOCK_H, MOCK_W
    root = tmp_path_factory.mktemp("restrepo") / "scene_1"
    (root / "imgs").mkdir(parents=True)
    (root / "cams_krt").mkdir()
    rng = np.random.RandomState(7)

    n_frames = 6
    for i in range(n_frames):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        imageio.imwrite(root / "imgs" / ("frame%05d.png" % (i + 1,)), img)
        K, R, t = _make_ring_camera(angle=(i - n_frames / 2) * 0.05, h=h, w=w)
        rows = (
            [" ".join("%.9g" % v for v in row) for row in K]
            + [" ".join("%.9g" % v for v in row) for row in R]
            + [" ".join("%.9g" % v for v in t.ravel())]
        )
        (root / "cams_krt" / ("frame%05d_cam.txt" % (i + 1,))).write_text(
            "\n".join(rows) + "\n"
        )

    (root / "scene_info.xml").write_text(
        '<?xml version="1.0"?>\n<info>\n'
        '  <bbox minx="-3" miny="-3" minz="-3" maxx="3" maxy="3" maxz="3"/>\n'
        '  <resolution val="0.01"/>\n</info>\n'
    )
    (root / "gt_mesh.obj").write_text(
        "v -5 -5 0\nv 5 -5 0\nv 5 5 0\nv -5 5 0\n"
        "vn 0 0 -1\nvn 0 0 -1\nvn 0 0 -1\nvn 0 0 -1\n"
        "f 1//1 2//2 3//3\nf 1//1 3//3 4//4\n"
    )
    return root
