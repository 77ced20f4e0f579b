"""Unit tests for the quality-benchmark harness statistics (tools/_bench_harness.py).

VERDICT r2 weak #3: std of a single-seed array is 0, so gap_vs_noise used to
print SIGNIFICANT for any nonzero gap at n=1. It must refuse a verdict unless
both sides have >= 2 seeds.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from _bench_harness import gap_vs_noise  # noqa: E402


def test_n1_refuses_verdict():
    assert gap_vs_noise("a - b", [0.5], [0.3]) == "no verdict (n<2)"
    assert gap_vs_noise("a - b", [0.5, 0.6], [0.3]) == "no verdict (n<2)"
    assert gap_vs_noise("a - b", [0.5], [0.3, 0.2]) == "no verdict (n<2)"


def test_significant_when_gap_exceeds_combined_std():
    # gap 0.2, stds ~0.005 each -> significant
    assert gap_vs_noise("a - b", [0.50, 0.51], [0.30, 0.31]) == "SIGNIFICANT"


def test_within_noise_when_gap_below_combined_std():
    # gap 0.01, stds 0.05 each -> within noise
    assert gap_vs_noise("a - b", [0.45, 0.55], [0.44, 0.54]) == "within noise"
