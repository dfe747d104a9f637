"""Keras .hdf5 -> Flax weight conversion for the published RayNet models.

The reference trains with Keras 2 on TF1 and publishes weights as .hdf5
checkpoints; its own loader does name-matched group surgery against the
file (/root/reference/raynet/models.py:294-341: keys
``model_weights/<model_name>/<weight_name>`` with a ``load_weights(
by_name=True)`` fallback). Without this converter the framework could
reproduce the paper's pipeline but not the paper's MODELS.

Supported layouts (all produced by Keras 2 era code):
  1. plain ``model.save_weights(path)``: layer groups at the file root,
     ordered by the root ``layer_names`` attribute;
  2. full ``model.save(path)`` / ModelCheckpoint: the same structure
     nested under ``model_weights``;
  3. the CNN as a SUB-MODEL of the siamese training net (the published
     RayNet checkpoints): one more level of nesting —
     ``model_weights/<submodel>/<layer>/<weight>:0``.

Dataset-name conventions per layer type (Keras 2):
  Conv2D               kernel:0 (kh, kw, cin, cout)  bias:0 (cout,)
  BatchNormalization   gamma:0  beta:0  moving_mean:0  moving_variance:0
  LayerNormalization   gamma:0 ([1]*ndims)           bias:0 (cout,)

Keras stores conv kernels HWIO — the same layout flax.linen.Conv uses —
and both frameworks compute cross-correlation, so kernels copy through
unchanged; a (cout, cin, kh, kw) kernel (Theano-ordered file) is
transposed into HWIO. BatchNorm epsilon is 1e-3 in both stacks.
"""
import re

import numpy as np

__all__ = ["load_keras_hdf5", "keras_variables_for_cnn"]


def _walk_datasets(group, prefix=""):
    """Yield (path, np.ndarray) for every dataset under ``group``."""
    import h5py

    for name, item in group.items():
        path = prefix + "/" + name if prefix else name
        if isinstance(item, h5py.Dataset):
            yield path, np.asarray(item)
        else:
            yield from _walk_datasets(item, path)


def _layer_index(name):
    """Trailing Keras auto-numbering (conv2d_3 -> 3; conv2d -> 0)."""
    m = re.search(r"_(\d+)$", name)
    return int(m.group(1)) if m else 0


def _collect_layers(f):
    """Group the file's datasets by owning layer, in model order.

    Returns an ordered list of (layer_name, {weight_basename: array}).
    Ordering: the ``layer_names``/``weight_names`` attributes when
    present (authoritative Keras ordering), else the layers' numeric
    name suffixes (Keras auto-names count globally per type, so
    conv2d_1 < conv2d_2 and batch_normalization_1 < ..._2).
    """
    root = f["model_weights"] if "model_weights" in f else f

    by_layer = {}
    order = {}
    for path, arr in _walk_datasets(root):
        parts = path.split("/")
        base = parts[-1].split(":")[0]
        # the owning layer is the innermost group that looks like a
        # layer scope (conv2d_3, batch_normalization_7, ...); for flat
        # layouts it's simply the dataset's parent group
        layer = parts[-2] if len(parts) >= 2 else parts[0]
        by_layer.setdefault(layer, {})[base] = arr
        order.setdefault(layer, len(order))

    names = None
    if "layer_names" in root.attrs:
        names = [
            n.decode() if isinstance(n, bytes) else str(n)
            for n in root.attrs["layer_names"]
        ]
        names = [n for n in names if n in by_layer]
    if not names:
        names = sorted(
            by_layer, key=lambda n: (_layer_index(n), order[n])
        )
    return [(n, by_layer[n]) for n in names]


def _classify(weights):
    """'conv' / 'bn' / 'ln' / None from a layer's weight basenames."""
    keys = set(weights)
    if "moving_mean" in keys or "moving_variance" in keys:
        return "bn"
    if "kernel" in keys:
        return "conv"
    if "gamma" in keys and "bias" in keys:
        return "ln"
    return None


def keras_variables_for_cnn(path, variables):
    """Convert a Keras .hdf5 checkpoint into the given Flax variable
    tree (``{'params': ..., 'batch_stats': ...}`` from one of the
    cnn_factory stacks). Layers map BY POSITION within type (i-th Keras
    Conv2D -> Conv_i, i-th BatchNormalization -> BatchNorm_i, ...), the
    same correspondence the reference's by-name surgery encodes; every
    target leaf must be filled and every shape must match, else raises.
    """
    import h5py

    import flax

    flat = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(variables)
    )

    new = {}

    def put(key, arr, like_key=None):
        ref = flat.get(key)
        if ref is None:
            raise ValueError(
                "hdf5 import: file provides %r but the %s model has no "
                "such parameter" % ("/".join(key), "target")
            )
        arr = np.asarray(arr)
        if arr.shape != ref.shape:
            if arr.ndim == 4 and arr.transpose(2, 3, 1, 0).shape == ref.shape:
                arr = arr.transpose(2, 3, 1, 0)  # OIHW (Theano) -> HWIO
            elif arr.size == ref.size:
                arr = arr.reshape(ref.shape)
            else:
                raise ValueError(
                    "hdf5 import: %s shape %s does not match target %s"
                    % ("/".join(key), arr.shape, ref.shape)
                )
        new[key] = arr.astype(ref.dtype)

    # locate the module scope holding Conv_0 (SimpleCNN nests the stack
    # under _ConvBNStack_0; HartmannCNN holds convs at the top level)
    scopes = {k[1:-2] for k in flat if k[0] == "params" and
              k[-2].startswith("Conv_")}
    if not scopes:
        raise ValueError("target model has no Conv layers")
    scope = sorted(scopes)[0]

    with h5py.File(path, "r") as f:
        layers = _collect_layers(f)
        counts = {"conv": 0, "bn": 0, "ln": 0}
        for name, weights in layers:
            kind = _classify(weights)
            if kind is None:
                continue  # activations / reshapes carry no weights
            i = counts[kind]
            counts[kind] += 1
            if kind == "conv":
                mod = "Conv_%d" % i
                put(("params",) + scope + (mod, "kernel"),
                    weights["kernel"])
                if "bias" in weights:
                    put(("params",) + scope + (mod, "bias"),
                        weights["bias"])
            elif kind == "bn":
                mod = "BatchNorm_%d" % i
                put(("params",) + scope + (mod, "scale"),
                    weights["gamma"])
                put(("params",) + scope + (mod, "bias"), weights["beta"])
                put(("batch_stats",) + scope + (mod, "mean"),
                    weights["moving_mean"])
                put(("batch_stats",) + scope + (mod, "var"),
                    weights["moving_variance"])
            else:  # ln
                mod = "LayerNormalization_%d" % i
                put(("params",) + scope + (mod, "gamma"),
                    weights["gamma"])
                put(("params",) + scope + (mod, "bias"), weights["bias"])

    missing = sorted(set(flat) - set(new))
    if missing:
        raise ValueError(
            "hdf5 import: checkpoint fills %d/%d parameters; missing: %s"
            % (len(new), len(flat),
               ", ".join("/".join(k) for k in missing[:8]))
        )
    restored = flax.traverse_util.unflatten_dict(new)
    return flax.serialization.from_state_dict(variables, restored)


def load_keras_hdf5(path, variables):
    """Alias used by FeatureExtractor.load_weights for .hdf5/.h5 files."""
    return keras_variables_for_cnn(path, variables)
