"""raynet_train CLI smoke test on the mock scene."""
import os

import numpy as np

from raynet_tpu.scripts import train_raynet as train_cli


def test_train_raynet_cli(mock_scene_dir, tmp_path):
    train_cli.main(
        [
            str(mock_scene_dir.parent),
            str(mock_scene_dir.parent),
            str(tmp_path),
            "--iterations", "2",
            "--validate_every", "1",
            "--snapshot_every", "2",
            "--rays_batch_size", "3",
            "--window", "2",
            "--train_with_gamma",
            "--depth_planes", "4",
            "--neighbors", "4",
            "--patch_shape", "11,11,3",
            "--grid_shape", "8,8,8",
            "--maximum_number_of_marched_voxels", "16",
            "--bp_iterations", "2",
        ]
    )
    exps = os.listdir(tmp_path)
    assert len(exps) == 1
    exp = tmp_path / exps[0]
    stats = (exp / "train_statistics.txt").read_text().strip().splitlines()
    assert stats[0] == "scene_idx loss gamma"
    assert len(stats) == 3  # header + 2 iterations
    loss, gamma = float(stats[1].split()[1]), float(stats[1].split()[2])
    assert np.isfinite(loss) and 0 < gamma < 1
    assert (exp / "val_loss.txt").read_text().strip()
    weight_files = os.listdir(exp / "weights")
    assert "weights.final.msgpack" in weight_files
    assert "weights.1.msgpack" in weight_files


def _train_args(mock_scene_dir, out, iters, extra=()):
    return [
        str(mock_scene_dir.parent),
        str(mock_scene_dir.parent),
        str(out),
        "--iterations", str(iters),
        "--validate_every", "100",
        "--snapshot_every", "100",
        "--rays_batch_size", "3",
        "--window", "2",
        "--depth_planes", "4",
        "--neighbors", "4",
        "--patch_shape", "11,11,3",
        "--grid_shape", "8,8,8",
        "--maximum_number_of_marched_voxels", "16",
        "--bp_iterations", "2",
        "--checkpoint_every", "1",
    ] + list(extra)


def test_train_raynet_kill_and_resume(mock_scene_dir, tmp_path, capsys):
    """An interrupted raynet_train resumes from the orbax checkpoint with
    the FULL state (params + optimizer moments + step), continuing at the
    saved iteration instead of restarting."""
    train_cli.main(_train_args(mock_scene_dir, tmp_path, 2))
    exp = tmp_path / os.listdir(tmp_path)[0]

    # State after the "crash": 2 iterations checkpointed.
    ckpts = os.listdir(exp / "checkpoints")
    assert "2" in ckpts
    w_before = (exp / "weights" / "weights.final.msgpack").read_bytes()
    capsys.readouterr()

    # Resume for 2 more iterations into the SAME experiment directory.
    train_cli.main(
        _train_args(mock_scene_dir, tmp_path, 4, ["--resume", str(exp)])
    )
    out = capsys.readouterr().out
    assert "resumed from checkpoint at iteration 2" in out
    assert len(os.listdir(tmp_path)) == 1  # no new experiment dir created
    stats = (exp / "train_statistics.txt").read_text().strip().splitlines()
    assert stats[0] == "scene_idx loss gamma"
    assert len(stats) == 5  # one header + 2 + 2 iterations, appended
    assert "4" in os.listdir(exp / "checkpoints")
    # Training continued past the crash point rather than re-saving it.
    w_after = (exp / "weights" / "weights.final.msgpack").read_bytes()
    assert w_after != w_before
