"""Driver-contract checks: __graft_entry__.entry() is jittable and
dryrun_multichip executes the distributed step on the virtual CPU mesh."""
import sys
import os

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge


def test_entry_jittable():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    F = np.asarray(out.F)
    assert np.isfinite(F).all() and F.min() >= 0 and F.max() <= 1


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    ge.dryrun_multichip(6)
