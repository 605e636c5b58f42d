"""Driver entry points must keep compiling: entry() and dryrun_multichip."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    full, central = jax.jit(fn)(*args)
    assert central.shape == (8, 17, 3)
    assert full.shape == (8, 71, 17, 3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
@pytest.mark.timeout(570)  # compiles the full dp×mp train/eval/resume suite
def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
