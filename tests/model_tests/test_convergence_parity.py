"""Short convergence-parity check vs the torch oracle (full run:
``python benchmarks/convergence_parity.py --steps 600`` — see PARITY.md)."""

import os
import sys

import pytest

BENCH_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "benchmarks"))


def test_short_convergence_parity():
    sys.path.insert(0, BENCH_DIR)
    try:
        from convergence_parity import main
    finally:
        sys.path.remove(BENCH_DIR)
    # 150 steps keeps the suite fast; both sides must clear 0.70 mIoU on
    # the learnable task and land within 0.10 of each other.
    report = main(steps=150, eval_every=75, tolerance=0.10, min_miou=0.70)
    assert report["delta"] <= 0.10
