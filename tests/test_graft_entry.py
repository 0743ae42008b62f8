"""The driver-facing entry points must always compile and run (single-chip
jit + multi-chip dry run on the faked 8-device CPU mesh)."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge


def test_entry_jits_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    sk_hi, sk_lo, shared, union = out
    assert sk_hi.shape == sk_lo.shape == (64,)
    assert shared.shape == union.shape == (1, 8)
    # the genome has >= s distinct k-mers whp → full sketch, union == s
    assert np.asarray(union).max() <= 64


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd_subset():
    # also valid on a non-power-of-two device count (data axis collapses to 1)
    ge.dryrun_multichip(3)
