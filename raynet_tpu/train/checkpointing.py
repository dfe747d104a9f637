"""Checkpoint/resume for training states (orbax).

The reference's fault tolerance was per-epoch Keras weight files plus
resume-by-weight-file (SURVEY.md §5). Here full train states — parameters,
optimizer moments, batch statistics, step — round-trip through orbax, so an
interrupted run resumes exactly; plain msgpack weight files remain the
lightweight interchange format (models/feature_extractor.py).
"""
import os

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper: save every N steps, keep the last K, resume."""

    def __init__(self, directory, save_interval_steps=500, max_to_keep=3):
        self._directory = os.path.abspath(directory)
        os.makedirs(self._directory, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            self._directory,
            options=ocp.CheckpointManagerOptions(
                save_interval_steps=save_interval_steps,
                max_to_keep=max_to_keep,
                create=True,
            ),
        )

    def save(self, step, state, force=False):
        self._manager.save(
            step, args=ocp.args.StandardSave(state), force=force
        )

    def restore(self, state_template, step=None):
        """Restore into the shape of ``state_template``; latest by default.

        Returns (state, step) or (state_template, None) when no checkpoint
        exists.
        """
        step = step if step is not None else self._manager.latest_step()
        if step is None:
            return state_template, None
        restored = self._manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        return restored, step

    def latest_step(self):
        return self._manager.latest_step()

    def wait(self):
        self._manager.wait_until_finished()

    def close(self):
        self._manager.close()
