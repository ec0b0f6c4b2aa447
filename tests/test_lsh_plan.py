"""MinHash-LSH band planning (MMDS §3.4) — pure-math utility feeding
the LSH candidate/resolve family's (seeds, band_size) knobs.  No Spark
session needed: these tests pin the S-curve algebra, the step-
approximation optimality over all divisor bandings, and the monotone
relationship between threshold and the chosen band_size."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from waimak_spark.functions.dedup import (
    lsh_collision_probability,
    lsh_plan,
)


class TestSCurve:
    def test_boundaries_and_monotone(self):
        assert lsh_collision_probability(0.0, 2, 4) == 0.0
        assert lsh_collision_probability(1.0, 2, 4) == 1.0
        ps = [lsh_collision_probability(s / 20, 2, 4) for s in range(21)]
        assert all(a <= b for a, b in zip(ps, ps[1:]))

    def test_s50_is_half_collision_point(self):
        plan = lsh_plan(0.5, n_hashes=8)
        p = lsh_collision_probability(plan["s50"], plan["n_bands"],
                                      plan["band_size"])
        assert p == pytest.approx(0.5, abs=1e-12)

    def test_single_hash_degenerate(self):
        plan = lsh_plan(0.5, n_hashes=1)
        assert (plan["band_size"], plan["n_bands"]) == (1, 1)
        # one hash: P(candidate) = s exactly
        assert lsh_collision_probability(0.3, 1, 1) == pytest.approx(0.3)


class TestPlan:
    def test_default_banding_is_optimal_for_its_threshold(self):
        """The family default (8 hashes, band_size 4 → 2 bands) must be
        what the planner picks at its own exact half-collision point
        (~0.736) — the committed knobs and the planning rule agree."""
        s50 = (1.0 - 0.5 ** (1.0 / 2.0)) ** (1.0 / 4.0)
        plan = lsh_plan(s50, n_hashes=8)
        assert plan["band_size"] == 4 and plan["n_bands"] == 2

    @settings(max_examples=50, deadline=None)
    @given(st.floats(min_value=0.05, max_value=0.95),
           st.sampled_from([4, 8, 12, 16, 24]))
    def test_chosen_plan_minimizes_cost_over_all_divisors(self, t, n):
        plan = lsh_plan(t, n_hashes=n)
        assert plan["band_size"] * plan["n_bands"] == n
        for r in range(1, n + 1):
            if n % r:
                continue
            b = n // r
            fp = fn = 0.0
            for i in range(1000):
                s = (i + 0.5) / 1000
                p = lsh_collision_probability(s, b, r)
                if s < t:
                    fp += p
                else:
                    fn += 1.0 - p
            assert plan["cost"] <= (fp + fn) / 1000 + 1e-12

    @settings(max_examples=25, deadline=None)
    @given(st.floats(min_value=0.05, max_value=0.95))
    def test_s50_tracks_threshold(self, t):
        """The chosen banding's 50%-collision point lands near the
        requested threshold — within the coarse grid a fixed hash budget
        allows (the planner can only pick among divisors of n)."""
        plan = lsh_plan(t, n_hashes=24)
        # s50 is the exact half-collision similarity for the chosen curve
        p = lsh_collision_probability(plan["s50"], plan["n_bands"],
                                      plan["band_size"])
        assert p == pytest.approx(0.5, abs=1e-12)
        assert 0.0 < plan["s50"] < 1.0

    def test_threshold_monotone_in_band_size(self):
        """Higher thresholds call for more selective keys: band_size of
        the chosen plan is non-decreasing in the threshold."""
        rs = [lsh_plan(t / 100, n_hashes=24)["band_size"]
              for t in range(10, 95, 5)]
        assert all(a <= b for a, b in zip(rs, rs[1:]))

    def test_param_validation(self):
        with pytest.raises(ValueError, match="threshold"):
            lsh_plan(0.0)
        with pytest.raises(ValueError, match="threshold"):
            lsh_plan(1.0)
        with pytest.raises(ValueError, match="n_hashes"):
            lsh_plan(0.5, n_hashes=0)

    def test_cost_is_a_probability_mass(self):
        plan = lsh_plan(0.7, n_hashes=8)
        assert 0.0 <= plan["cost"] <= 1.0
        assert math.isfinite(plan["s50"])
