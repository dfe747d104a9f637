"""Driver entry points: entry() compiles and runs; dryrun_multichip executes
the sharded training step on the virtual CPU mesh."""
import sys
import os

import numpy as np
import pytest
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (256,)
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
