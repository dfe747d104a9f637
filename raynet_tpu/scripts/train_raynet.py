#!/usr/bin/env python
"""raynet_train: end-to-end training of the full RayNet pipeline.

Parity: raynet/scripts/train_raynet.py — manual iteration loop over
single-scene ray batches, validate_every / snapshot_every cadence,
train_statistics.txt (+ val_loss.txt) logs, per-snapshot weight files,
optionally trainable gamma.
"""
import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..common.generation_parameters import GenerationParameters
from ..common.sampling_schemes import get_sampling_scheme
from ..train.batch_provider import RayNetBatchProvider
from ..train.sample import RayNetRandomSampleGenerator, RayNetSampleGenerator
from ..train.train_e2e import build_end_to_end_training
from .arguments import (
    add_nn_arguments,
    add_training_arguments,
    add_generation_arguments,
    add_dataset_related_arguments,
    add_mrf_related_arguments,
    get_input_output_shapes,
    build_dataset,
)
from .experiments_utils.experiments_manager import set_output_directory


def _to_device_batch(batch):
    return {
        k: jnp.asarray(v) for k, v in batch.items() if k != "scene_idx"
    }


def save_weights(state, path):
    import flax

    with open(path, "wb") as f:
        f.write(
            flax.serialization.to_bytes(
                {
                    "params": state.params["cnn"],
                    "batch_stats": state.batch_stats,
                }
            )
        )


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Train RayNet end to end (CNN + unrolled MRF-BP)"
    )
    parser.add_argument("training_directory")
    parser.add_argument("test_directory")
    parser.add_argument("output_directory")
    parser.add_argument(
        "--weight_file",
        default=None,
        help="Pretrained CNN weights to start from (msgpack)",
    )
    parser.add_argument("--iterations", type=int, default=100000)
    parser.add_argument("--validate_every", type=int, default=200)
    parser.add_argument("--snapshot_every", type=int, default=500)
    parser.add_argument("--rays_batch_size", type=int, default=1000,
                        help="Rays per training batch")
    parser.add_argument("--n_rays", type=int, default=10000,
                        help="Rays drawn per reference image")
    parser.add_argument("--window", type=int, default=4)
    parser.add_argument("--train_with_gamma", action="store_true")
    parser.add_argument("--seed", type=int, default=27)
    parser.add_argument(
        "--checkpoint_every", type=int, default=500,
        help="Save the FULL training state (params + optimizer moments + "
             "batch stats + step) with orbax every N iterations",
    )
    parser.add_argument(
        "--resume", default=None, metavar="EXPERIMENT_DIR",
        help="Resume an interrupted run from its experiment directory's "
             "latest orbax checkpoint (logs are appended)",
    )
    add_nn_arguments(parser)
    add_training_arguments(parser)
    add_generation_arguments(parser)
    add_dataset_related_arguments(parser)
    add_mrf_related_arguments(parser)
    args = parser.parse_args(argv)

    np.random.seed(args.seed)
    if args.resume:
        experiment_dir = args.resume
        weights_dir = os.path.join(experiment_dir, "weights")
        if not os.path.isdir(weights_dir):
            raise SystemExit(
                "--resume %r is not an experiment directory" % (args.resume,)
            )
    else:
        experiment_dir, weights_dir, _ = set_output_directory(
            args.output_directory
        )
    print("experiment directory:", experiment_dir)

    gp = GenerationParameters.from_options(args)
    scheme = get_sampling_scheme(args.sampling_policy)(gp)

    train_ds = build_dataset(
        args.dataset_type,
        args.training_directory,
        args.illumination_condition,
        args.select_neighbors_based_on,
    )
    test_ds = build_dataset(
        args.dataset_type,
        args.test_directory,
        args.illumination_condition,
        args.select_neighbors_based_on,
    )

    in_shapes, out_shapes = get_input_output_shapes("default")(gp)
    train_sg = RayNetRandomSampleGenerator(
        scheme, gp, list(range(train_ds.n_scenes)), in_shapes, out_shapes,
        n_rays=args.n_rays, window=args.window,
    )
    test_sg = RayNetSampleGenerator(
        scheme, gp, list(range(test_ds.n_scenes)), in_shapes, out_shapes,
        n_rays=args.n_rays, window=args.window,
    )
    train_bp = RayNetBatchProvider(train_ds, train_sg)
    test_bp = RayNetBatchProvider(test_ds, test_sg)

    print("collecting the validation batch...")
    val_batch = _to_device_batch(
        test_bp.get_batch_of_rays(args.rays_batch_size)
    )

    state, train_fn, eval_fn = build_end_to_end_training(
        jax.random.PRNGKey(args.seed),
        gp,
        gp.grid_shape,
        cnn_name=args.cnn_factory,
        loss=args.loss,
        optimizer=args.optimizer,
        lr=args.lr,
        momentum=args.momentum,
        gamma=args.initial_gamma_prior,
        train_with_gamma=args.train_with_gamma,
        bp_iterations=args.bp_iterations,
        weight_file=args.weight_file,
    )
    if not args.weight_file:
        print(
            "WARNING: training end-to-end from random CNN weights; the "
            "reference requires a pretrained model here"
        )

    from ..train.checkpointing import CheckpointManager

    ckpt = CheckpointManager(
        os.path.join(experiment_dir, "checkpoints"),
        save_interval_steps=max(1, args.checkpoint_every),
    )
    state, resumed_step = ckpt.restore(state)
    start_it = 0
    if resumed_step is not None:
        start_it = int(resumed_step)
        print("resumed from checkpoint at iteration %d" % (start_it,))

    mode = "a" if args.resume else "w"
    stats = open(
        os.path.join(experiment_dir, "train_statistics.txt"), mode
    )
    val_log = open(os.path.join(experiment_dir, "val_loss.txt"), mode)
    if start_it == 0:
        print("scene_idx loss gamma", file=stats)

    try:
        for it in range(start_it, args.iterations):
            batch = train_bp.get_batch_of_rays(args.rays_batch_size)
            scene_idx = batch["scene_idx"]
            state, metrics = train_fn(state, _to_device_batch(batch))
            print(
                "%s %f %f"
                % (scene_idx, float(metrics["loss"]), float(metrics["gamma"])),
                file=stats,
            )
            stats.flush()

            if (it + 1) % args.validate_every == 0:
                val = eval_fn(state, val_batch)
                print("%d %f" % (it, float(val["loss"])), file=val_log)
                val_log.flush()
                print(
                    "iteration %d: val_loss=%f gamma=%f"
                    % (it, float(val["loss"]), float(metrics["gamma"]))
                )
            if (it + 1) % args.snapshot_every == 0:
                save_weights(
                    state,
                    os.path.join(weights_dir, "weights.%d.msgpack" % (it,)),
                )
            # The manager applies save_interval_steps itself; this is a
            # no-op except every checkpoint_every iterations.
            ckpt.save(it + 1, state)
    except KeyboardInterrupt:
        print("interrupted; saving final weights")
    finally:
        save_weights(state, os.path.join(weights_dir, "weights.final.msgpack"))
        ckpt.wait()
        ckpt.close()
        stats.close()
        val_log.close()


if __name__ == "__main__":
    main()
