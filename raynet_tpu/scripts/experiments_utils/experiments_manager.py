"""Experiment bookkeeping: tagged output dirs, local result archives, txt
metric logs, optional spreadsheet registration.

Parity: raynet/scripts/experiments_utils/ — random 20-char experiment tags,
<experiment>/weights + /plots directories, parameters.json + results.npy,
and the Metrics txt parser. The Google-Sheets append is gated: without the
gspread/oauth stack (not available in this environment) registration falls
back to a local experiments.jsonl.
"""
import json
import os
import random
import string

import numpy as np


def experiment_tag(n=20):
    return "".join(
        random.choice(string.ascii_letters + string.digits) for _ in range(n)
    )


def set_output_directory(output_directory):
    """Create <output>/<tag>/{weights,plots} and return their paths."""
    tag = experiment_tag()
    experiment_directory = os.path.join(output_directory, tag)
    weights_dir = os.path.join(experiment_directory, "weights")
    plots_dir = os.path.join(experiment_directory, "plots")
    for d in (experiment_directory, weights_dir, plots_dir):
        os.makedirs(d, exist_ok=True)
    return experiment_directory, weights_dir, plots_dir


class Metrics:
    """Parse the whitespace metric logs written by MetricsHistory."""

    def __init__(self, train_file, val_file):
        self.train = self._parse(train_file)
        self.val = self._parse(val_file)

    @staticmethod
    def _parse(path):
        if not os.path.isfile(path):
            return {}
        with open(path) as f:
            lines = [l.split() for l in f if l.strip()]
        if not lines:
            return {}
        keys = lines[0]
        cols = list(zip(*lines[1:])) if len(lines) > 1 else [[]] * len(keys)
        return {
            k: np.array([float(v) for v in col])
            for k, col in zip(keys, cols)
        }

    def summary(self):
        out = {}
        for prefix, data in (("train", self.train), ("val", self.val)):
            for k, v in data.items():
                if len(v):
                    out["%s_%s_last" % (prefix, k)] = float(v[-1])
                    out["%s_%s_best" % (prefix, k)] = float(v.min())
        return out


class MetricsHistory:
    """Stream per-batch / per-epoch metric rows to txt files (same format as
    the reference's Keras callback)."""

    def __init__(self, filepath_train, filepath_val, mode="w"):
        self.fd_t = open(filepath_train, mode)
        self.fd_v = open(filepath_val, mode)
        self.keys_t = []
        self.keys_v = []
        # When appending to a resumed run the header row already exists.
        self._skip_header = mode == "a"

    def _on_end(self, fd, keys, logs):
        if not keys:
            keys.extend(sorted(logs.keys()))
            if not self._skip_header:
                print(" ".join(keys), file=fd)
        print(" ".join(str(logs[k]) for k in keys), file=fd)
        fd.flush()

    def on_batch_end(self, logs):
        self._on_end(self.fd_t, self.keys_t, logs)

    def on_epoch_end(self, epoch, logs):
        d = {"epoch": epoch}
        d.update({k: v for k, v in logs.items() if k.startswith("val_")})
        self._on_end(self.fd_v, self.keys_v, d)

    def close(self):
        self.fd_t.close()
        self.fd_v.close()


def save_experiment_locally(experiment_directory, parameters, results):
    """parameters.json + results.npy inside the experiment directory."""
    with open(os.path.join(experiment_directory, "parameters.json"), "w") as f:
        json.dump(
            {k: _jsonable(v) for k, v in parameters.items()}, f, indent=2
        )
    np.save(os.path.join(experiment_directory, "results.npy"), results)


def _jsonable(v):
    if isinstance(v, (np.ndarray, tuple)):
        return list(np.asarray(v).tolist())
    if isinstance(v, (np.integer, np.floating)):
        return v.item()
    return v if isinstance(v, (int, float, str, bool, list, type(None))) else str(v)


def register_experiment(credentials, spreadsheet, parameters, results):
    """Append the experiment to a Google Sheet when the gspread stack is
    available; otherwise append to ~/.raynet_tpu_experiments.jsonl."""
    try:
        import gspread  # noqa: F401 — optional dependency

        raise NotImplementedError(
            "spreadsheet registration requires network access"
        )
    except ImportError:
        fallback = os.path.expanduser("~/.raynet_tpu_experiments.jsonl")
        with open(fallback, "a") as f:
            f.write(
                json.dumps(
                    {
                        "spreadsheet": spreadsheet,
                        "parameters": {
                            k: _jsonable(v) for k, v in parameters.items()
                        },
                        "results": _jsonable(results),
                    }
                )
                + "\n"
            )
        return fallback
