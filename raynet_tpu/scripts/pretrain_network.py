#!/usr/bin/env python
"""raynet_pretrain: pretrain the multi-view patch-similarity CNN.

Parity: raynet/scripts/pretrain_network.py — tagged experiment directory,
train.txt/val.txt metric streams, per-epoch checkpoints, LR schedule, fixed
collected test set, parameters.json + results.npy, optional experiment
registration.
"""
import argparse
import os

import numpy as np
import jax

from ..common.generation_parameters import GenerationParameters
from ..common.sampling_schemes import get_sampling_scheme
from ..train.batch_provider import BatchProvider
from ..train.pretrain import create_pretrain_state, make_pretrain_step
from .arguments import (
    add_nn_arguments,
    add_training_arguments,
    add_generation_arguments,
    add_experiments_related_arguments,
    add_hartmann_related_arguments,
    add_dataset_related_arguments,
    get_input_output_shapes,
    get_sample_generator,
    build_dataset,
)
from .experiments_utils.experiments_manager import (
    set_output_directory,
    save_experiment_locally,
    register_experiment,
    MetricsHistory,
)


def collect_test_set(dataset, sample_generator, n_samples, batch_size):
    """Materialize a fixed validation set through a short-lived provider."""
    bp = BatchProvider(
        dataset,
        sample_generator,
        cache_size=max(n_samples, batch_size),
        batch_size=n_samples,
    )
    try:
        bp.ready()
        X, y = bp.get_batch()
    finally:
        bp.stop()
    return X, y


def lr_schedule(lr, factor, reductions, steps_per_epoch):
    """Optax-compatible step schedule: divide by ``factor`` at each epoch in
    ``reductions`` (parity: pretrain_network.py's LearningRateScheduler)."""
    if factor is None:
        return lr

    import jax.numpy as jnp

    boundaries = jnp.asarray(
        [e * steps_per_epoch for e in reductions], dtype=jnp.int32
    )

    def inner(step):
        drops = (step >= boundaries).sum()
        return lr * factor ** (-drops.astype(jnp.float32))

    return inner


def _hartmann_loop(
    args, generation_params, train_ds, train_sg, test_X, test_y,
    experiment_dir, weights_dir,
):
    """Hartmann-baseline pretraining: quintuple patches, 2-way CE."""
    import jax
    import numpy as np
    from ..train.pretrain import create_hartmann_pretrain_state
    from ..train.batch_provider import BatchProvider

    model, state, train_step = create_hartmann_pretrain_state(
        jax.random.PRNGKey(args.seed),
        tuple(generation_params.patch_shape),
        n_views=generation_params.neighbors + 1,
        optimizer=args.optimizer,
        lr=args.lr,
        momentum=args.momentum,
    )
    history = MetricsHistory(
        os.path.join(experiment_dir, "train.txt"),
        os.path.join(experiment_dir, "val.txt"),
    )
    provider = BatchProvider(
        train_ds, train_sg,
        cache_size=args.training_cached_samples,
        batch_size=args.batch_size,
    )
    try:
        provider.ready()
        for epoch in range(args.epochs):
            for _ in range(args.steps_per_epoch):
                X, y = provider.get_batch()
                patches = np.stack(X, axis=1)  # (B, V, ph, pw, C)
                state, metrics = train_step(state, patches, y[0])
                history.on_batch_end(
                    {k: float(v) for k, v in metrics.items()}
                )
            history.on_epoch_end(
                epoch, {"val_loss": float(metrics["loss"])}
            )
            save_weights(
                state,
                os.path.join(weights_dir, "weights.%02d.msgpack" % (epoch,)),
            )
    finally:
        provider.stop()
        history.close()
    save_experiment_locally(experiment_dir, vars(args), [])


def save_weights(state, path):
    import flax

    with open(path, "wb") as f:
        f.write(
            flax.serialization.to_bytes(
                {"params": state.params, "batch_stats": state.batch_stats}
            )
        )


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=(
            "Pretrain the CNN that scores multi-view patch similarity "
            "for per-pixel depth distributions"
        )
    )
    parser.add_argument(
        "training_directory", help="Directory with the training scenes"
    )
    parser.add_argument(
        "test_directory", help="Directory with the test scenes"
    )
    parser.add_argument(
        "output_directory", help="Directory to save experiments"
    )
    parser.add_argument("--weight_file", default=None)
    parser.add_argument(
        "--input_output_dimensionality",
        choices=["default", "hartmann", "reference_wrt_others"],
        default="default",
    )
    parser.add_argument("--seed", type=int, default=27)
    parser.add_argument(
        "--resume", default=None, metavar="EXPERIMENT_DIR",
        help="Resume an interrupted run from its experiment directory's "
             "latest orbax checkpoint (full state: params + optimizer "
             "moments + batch stats; logs are appended)",
    )
    add_nn_arguments(parser)
    add_training_arguments(parser)
    add_generation_arguments(parser)
    add_experiments_related_arguments(parser)
    add_hartmann_related_arguments(parser)
    add_dataset_related_arguments(parser)
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

    generation_params = GenerationParameters.from_options(args)
    scheme = get_sampling_scheme(args.sampling_policy)(generation_params)

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

    in_shapes, out_shapes = get_input_output_shapes(
        args.input_output_dimensionality
    )(generation_params)
    sg_cls = get_sample_generator(
        {
            "default": "default",
            "hartmann": "hartmann",
            "reference_wrt_others": "reference_wrt_others",
        }[args.input_output_dimensionality]
    )

    train_sg = sg_cls(
        scheme, generation_params, list(range(train_ds.n_scenes)),
        in_shapes, out_shapes,
    )
    test_sg = sg_cls(
        scheme, generation_params, list(range(test_ds.n_scenes)),
        in_shapes, out_shapes,
    )

    print("collecting the test set (%d samples)..." % (args.n_test_samples,))
    test_X, test_y = collect_test_set(
        test_ds, test_sg, args.n_test_samples, args.batch_size
    )

    if args.input_output_dimensionality == "hartmann":
        return _hartmann_loop(
            args, generation_params, train_ds, train_sg, test_X, test_y,
            experiment_dir, weights_dir,
        )

    model, state, loss_fn, wd = create_pretrain_state(
        jax.random.PRNGKey(args.seed),
        in_shapes[0],
        cnn_name=args.cnn_factory,
        optimizer=args.optimizer,
        lr=lr_schedule(
            args.lr, args.lr_factor, args.lr_epochs, args.steps_per_epoch
        ),
        momentum=args.momentum,
        loss=args.loss,
        reducer=args.reducer,
        merge_layer=args.merge_layer,
        weight_decay=args.weight_decay,
    )
    if args.weight_file:
        import flax

        with open(args.weight_file, "rb") as f:
            restored = flax.serialization.from_bytes(
                {"params": state.params, "batch_stats": state.batch_stats},
                f.read(),
            )
        state = state.replace(**restored)

    train_step, eval_step = make_pretrain_step(model, loss_fn, wd)

    from ..train.checkpointing import CheckpointManager

    ckpt = CheckpointManager(
        os.path.join(experiment_dir, "checkpoints"), save_interval_steps=1
    )
    state, resumed_epoch = ckpt.restore(state)
    start_epoch = 0 if resumed_epoch is None else int(resumed_epoch)
    if resumed_epoch is not None:
        print("resumed from checkpoint after epoch %d" % (start_epoch - 1,))

    history = MetricsHistory(
        os.path.join(experiment_dir, "train.txt"),
        os.path.join(experiment_dir, "val.txt"),
        mode="a" if args.resume else "w",
    )

    provider = BatchProvider(
        train_ds,
        train_sg,
        cache_size=args.training_cached_samples,
        batch_size=args.batch_size,
    )
    results = []
    try:
        provider.ready()
        for epoch in range(start_epoch, args.epochs):
            for step in range(args.steps_per_epoch):
                X, y = provider.get_batch()
                state, metrics = train_step(state, X[0], X[1], y[0])
                history.on_batch_end(
                    {k: float(v) for k, v in metrics.items()}
                )
            val = eval_step(state, test_X[0], test_X[1], test_y[0])
            val = {"val_%s" % k: float(v) for k, v in val.items()}
            history.on_epoch_end(epoch, val)
            print("epoch %d:" % epoch, val)
            results.append([val["val_loss"], val["val_acc"], val["val_mde"]])
            save_weights(
                state,
                os.path.join(weights_dir, "weights.%02d.msgpack" % (epoch,)),
            )
            ckpt.save(epoch + 1, state, force=True)
    except KeyboardInterrupt:
        print("interrupted; saving results so far")
    finally:
        provider.stop()
        ckpt.wait()
        ckpt.close()
        history.close()

    save_experiment_locally(
        experiment_dir, vars(args), np.array(results, dtype=np.float32)
    )
    register_experiment(
        args.credentials, args.spreadsheet, vars(args), results
    )


if __name__ == "__main__":
    main()
