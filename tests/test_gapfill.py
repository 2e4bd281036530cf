"""Gap fill + LOCF invariants on the sf0.001 fixture: complete spine per
key, zero observed counts on gap days, carry-forward semantics."""

from __future__ import annotations

from collections import defaultdict

SF_DIR = "/root/testdata/sf0.001"


def test_gap_fill_forward_invariants(spark):
    from realestatedeals_spark.plans.registry import QUERIES

    rows = QUERIES["e11_gap_fill_forward"].fn(spark, SF_DIR).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[(r["event_type"], r["grp"])].append(r)

    days_global = {r["day"] for r in rows}
    n_days = len(days_global)
    some_gap = False
    for key, krows in by_key.items():
        krows.sort(key=lambda r: r["day"])
        # complete spine: every key covers every day exactly once
        assert [r["day"] for r in krows] == sorted(days_global), key
        last_obs = None
        for r in krows:
            if r["n_events"] == 0:
                some_gap = True
                # gap day: carry-forward equals the last observed total
                # (None before the key's first observation)
                assert r["filled_total"] == last_obs, (key, r)
            else:
                assert r["filled_total"] is not None
                last_obs = r["filled_total"]
    assert n_days >= 2 and some_gap  # the fixture must actually exercise gaps
