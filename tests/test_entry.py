"""The driver entry points (__graft_entry__) run EXACTLY as the driver
invokes them — this pins the round-1 failure mode (hand-built static dev
dict missing a key, VERDICT.md round 1 item 1) so it cannot rot again."""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __graft_entry__ as graft  # noqa: E402


class TestDriverEntry:
    def test_entry_single_chip(self):
        fn, args = graft.entry()
        layers, sample_count = fn(*args)
        beauty = np.asarray(layers["beauty"])
        assert np.isfinite(beauty).all()
        assert beauty.max() > 0.0
        assert int(np.asarray(sample_count).min()) == 1

    def test_dryrun_multichip_eight(self):
        # the exact driver call; conftest already provides 8 CPU devices
        graft.dryrun_multichip(8)

    def test_dryrun_multichip_four(self):
        graft.dryrun_multichip(4)
