"""Unit tests for bench.py's scaling-estimator arithmetic.

The bench's measurement protocol (BASELINE.md "Sandbox protocol") has
grown real logic — high-water window gating, least-degraded-pairs
fallback, capacity normalization, concurrent-pair ratios — that decides
the number of record for the north_rule target. These are pure-Python
functions, so they get plain unit tests (no Spark session).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

B, F = str(bench.BASE_CORES), str(bench.FULL_CORES)
RATIO = bench.FULL_CORES / bench.BASE_CORES


def _meta(pre_b, pre_f, post_b=None, post_f=None):
    post_b = pre_b if post_b is None else post_b
    post_f = pre_f if post_f is None else post_f
    return {"ctl_pre": {B: pre_b, F: pre_f},
            "ctl_post": {B: post_b, F: post_f}}


def test_median_odd_even():
    assert bench._median([3.0, 1.0, 2.0]) == 2.0
    assert bench._median([4.0, 1.0, 3.0, 2.0]) == 2.5


def test_pair_capacity_means_pre_post():
    m = _meta(20.0, 80.0, 30.0, 90.0)
    # base mean 25, full mean 85
    assert abs(bench._pair_capacity(m) - 85.0 / 25.0) < 1e-9


def test_pair_window_frac_is_worst_of_four():
    hw = {B: 30.0, F: 120.0}
    m = _meta(30.0, 120.0, 15.0, 120.0)  # post base probe at 50%
    assert abs(bench._pair_window_frac(m, hw) - 0.5) < 1e-9


def test_fallback_relaxes_until_two_pairs_qualify():
    hw = {B: 30.0, F: 120.0}
    zipped = [
        ((100.0, 25.0), _meta(27.0, 110.0)),   # ~90% window
        ((110.0, 28.0), _meta(24.0, 100.0)),   # ~80% window
        ((300.0, 90.0), _meta(12.0, 50.0)),    # collapsed window
    ]
    kept, info = bench._fallback_select(zipped, hw)
    assert [p for p, _ in kept] == [(100.0, 25.0), (110.0, 28.0)]
    # the 80% pair forced one relaxation step below GATE_FRAC=0.85
    assert info["fallback_gate_frac"] <= 0.80
    assert info["fallback_pairs"] == 2


def test_fallback_drops_midrun_collapse_unseen_by_probes():
    """A run whose wall exploded mid-pair while both bracketing probes
    looked clean (the observed 423 s / 6.6x-the-min full run) must not
    drag the median: it is dropped by the 2x-the-level-min rule even
    when that leaves a single pair."""
    hw = {B: 30.0, F: 120.0}
    clean = _meta(29.0, 118.0)
    zipped = [
        ((100.0, 25.0), clean),
        ((105.0, 170.0), clean),   # full-side mid-run collapse, 6.8x min
    ]
    kept, info = bench._fallback_select(zipped, hw)
    assert [p for p, _ in kept] == [(100.0, 25.0)]
    assert info["collapse_dropped"] == 1


def test_fallback_degenerate_keeps_least_degraded_combined_pair():
    """Each level's min in a different half-collapsed pair: the 2x rule
    empties the selection, and the guard keeps the pair with the best
    combined (b + 4f) wall instead of returning nothing."""
    hw = {B: 30.0, F: 120.0}
    clean = _meta(29.0, 118.0)
    zipped = [
        ((100.0, 80.0), clean),    # best base, collapsed full
        ((300.0, 25.0), clean),    # collapsed base, best full
    ]
    kept, info = bench._fallback_select(zipped, hw)
    assert len(kept) == 1
    # (300 + 4*25)=400 < (100 + 4*80)=420
    assert [p for p, _ in kept] == [(300.0, 25.0)]
    assert info["collapse_dropped"] == 1


def test_concurrent_pair_ratio_arithmetic():
    """The concurrent pair's ratio fields: raw = tb/(R*median(tfs));
    capnorm divides by (measured capacity / ideal R)."""
    tb, tfs = 160.0, [42.0, 40.0, 44.0]
    cap_pre, cap_post = 3.4, 3.6
    raw = (tb / bench._median(tfs)) / RATIO
    capnorm = raw * RATIO / ((cap_pre + cap_post) / 2)
    assert abs(raw - (160.0 / 42.0) / RATIO) < 1e-9
    # capacity below ideal R means the host under-delivered the full
    # coreset: capnorm must exceed raw
    assert capnorm > raw


def test_quiet_ref_ladder_and_interpolation():
    assert bench._quiet_ref(2) == bench.QUIET_MOPS[2]
    assert bench._quiet_ref(3) == 36.0  # 12.0 * procs fallback
