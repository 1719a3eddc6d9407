"""The LSH sizing rule as code (round 5, COVERAGE item 13 follow-up).

scripts/ann_recall.py measured the failure mode — 256 buckets over 500
vectors starves recall@10 to 0.04 — and stated the rule prose-only:
``n_bits`` must track ``log2(n_items / candidate_budget)``.
:func:`suggest_n_bits` automates it; this pins the arithmetic and the
measured-example behavior without needing Spark.
"""

from __future__ import annotations

import pytest

from pyrosar_spark.operators.similarity import suggest_n_bits


def test_expected_bucket_population_tracks_budget():
    # n_items / 2**n_bits must stay >= candidate_budget (no starvation)
    for n_items in (1_000, 100_000, 10_000_000, 10**12):
        for budget in (50, 200, 1000):
            nb = suggest_n_bits(n_items, budget)
            if n_items >= 2 * budget:  # below this, the nb>=1 floor rules
                assert n_items / 2**nb >= budget, (n_items, budget, nb)
            # ... and within 2x of it (no pointless over-population)
            # unless a clamp bound was hit
            if 1 < nb < 32:
                assert n_items / 2**nb < 2 * budget, (n_items, budget, nb)


def test_measured_starvation_case_is_avoided():
    # the ann_recall.py measurement: 500 items, n_bits=8 gave recall
    # 0.04; the rule must never suggest anything close to that
    nb = suggest_n_bits(500, candidate_budget=125)
    assert nb <= 2
    assert 500 / 2**nb >= 125


def test_clamps_and_validation():
    assert suggest_n_bits(1, 1000) == 1          # tiny corpus floor
    assert suggest_n_bits(10**15, 1) == 32        # bucket-id ceiling
    with pytest.raises(ValueError):
        suggest_n_bits(0)
    with pytest.raises(ValueError):
        suggest_n_bits(100, 0)


def test_monotone_in_corpus_size():
    budget = 200
    prev = 0
    for n in (100, 10_000, 1_000_000, 10**9, 10**12):
        nb = suggest_n_bits(n, budget)
        assert nb >= prev
        prev = nb
