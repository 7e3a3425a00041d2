"""Driver entry points: jittable forward step + multichip dryrun."""

import jax
import pytest
import numpy as np



pytestmark = pytest.mark.slow

def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
