"""Guard the driver's 50-slot correctness window (VERDICT.md round 1 §2).

The external driver hash-checks exactly the first 50 entries of
``queries()`` — REGISTRY insertion order.  Round 1 lost hard correctness
signal for 66 queries because late registrations pushed §2 gates and the
LLM flagships out of the window.  These tests make that displacement a
loud local failure instead of a silent judge-time regression.
"""

from __future__ import annotations

from rearc_data_engineer_takehome_spark.queries import DRIVER_WINDOW, REGISTRY

WINDOW = 50

# Queries the window must never lose. Round-8 slim (VERDICT r07 item
# 1): every SURVEY.md §2 gate that has no other driver-visible row,
# plus ONE representative per broad LLM-tier area — the old 28-pin set
# (one per sub-family) wasted rotating slots once every pinned family
# had accumulated a cumulative driver-green row in r01–r07; evicted
# pins remain covered by those prior rows and the strict local parity
# suite.
MUST_HAVE = {
    "describe_lineitem",  # §2 A9
    "events_value_domain",  # §2 P8 / V7
    "events_user_completeness",  # §2 V8
    "orders_priority_union",  # §2.7 set ops
    "null_profile_orders",  # §2 A8 / V4
    "iqr_outliers_price",  # §2 A10 / V9
    "best_part_by_supplier",  # §2 W1 (flagship)
    "lineitem_part_report",  # §2 J1
    "pricing_summary",  # §2 A2
    # LLM-tier area representatives
    "dedup_minhash_lsh",  # dedup
    "knn_ivf",  # ANN / similarity
    "doc_pii_redaction",  # text / chunking
    "curation_pipeline",  # curation
}


def test_window_is_exactly_driver_window():
    assert list(REGISTRY)[:WINDOW] == DRIVER_WINDOW


def test_window_contains_priority_set():
    window = set(list(REGISTRY)[:WINDOW])
    missing = MUST_HAVE - window
    assert not missing, f"priority queries outside driver window: {missing}"


# Round 10 (VERDICT r09 item 1): the two approx_count_distinct
# queries were reshaped to emit exact aggregates plus deterministic
# within-bounds booleans, so they carry full value-hash oracles now —
# NO registry query is allowed a no-oracle row anymore.
ROWS_ONLY_OK: set[str] = set()


def test_window_has_no_no_oracle_entries():
    window = list(REGISTRY)[:WINDOW]
    no_oracle = [
        n for n in window
        if REGISTRY[n].oracle is None and n not in ROWS_ONLY_OK
    ]
    assert no_oracle == [], no_oracle


def test_all_window_names_registered_and_unique():
    assert len(DRIVER_WINDOW) == WINDOW
    assert len(set(DRIVER_WINDOW)) == WINDOW
    assert all(n in REGISTRY for n in DRIVER_WINDOW)


def test_window_rotates_in_never_driver_checked_queries():
    """Round-4 policy (VERDICT r03 item 2), round-9 refinement: a
    query counts as driver-checked only when some prior round's
    CORRECTNESS row is CLEAN (err is null — an err=no_oracle record
    certifies nothing). While never-checked queries remain, every
    one that fits in the rotating slots MUST be in the window (the
    completion sweep, VERDICT r08 item 1); once the registry is
    fully swept, the slots re-certify the stalest prior rows
    instead, and this gate only demands the new-this-round queries
    appear."""
    import json
    import os

    # Rounds PRIOR to the current window's authoring (update when
    # rotating: the current round's own CORRECTNESS file will contain
    # this window by construction and must not count against it).
    prior_rounds = (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
        "CORRECTNESS_r05.json",
        "CORRECTNESS_r06.json",
        "CORRECTNESS_r07.json",
        "CORRECTNESS_r08.json",
        "CORRECTNESS_r09.json",
        "CORRECTNESS_r10.json",
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prior: set[str] = set()
    for fname in prior_rounds:
        path = os.path.join(root, fname)
        if os.path.exists(path):
            for name, row in json.load(open(path)).items():
                if row.get("err") is None:
                    prior.add(name)
    if not prior:  # round 1: nothing to rotate against
        return
    never = set(REGISTRY) - prior
    window = set(DRIVER_WINDOW)
    capacity = WINDOW - len(MUST_HAVE & window)
    if len(never) <= capacity:
        missing = never - window
        assert not missing, (
            f"never-driver-checked queries left OUT of the window "
            f"with {capacity - len(never & window)} slots free: "
            f"{sorted(missing)}"
        )
    else:
        fresh = [n for n in DRIVER_WINDOW if n not in prior]
        assert len(fresh) >= 20, (
            f"only {len(fresh)} never-driver-checked queries in "
            f"window: {fresh}"
        )
        return
    # staleness re-certification (round-10 policy, VERDICT r09 item
    # 4): once every query has a clean row, the remaining slots must
    # carry the STALEST green rows — no query outside the window may
    # be strictly staler than any re-certification filler inside it.
    latest: dict[str, int] = {}
    for rnd, fname in enumerate(prior_rounds, start=1):
        path = os.path.join(root, fname)
        if os.path.exists(path):
            for name, row in json.load(open(path)).items():
                if row.get("err") is None:
                    latest[name] = rnd
    fillers = [
        n for n in DRIVER_WINDOW
        if n not in MUST_HAVE and n not in never
    ]
    outside = [n for n in REGISTRY if n not in window and n in latest]
    if fillers and outside:
        worst_in = max(latest[n] for n in fillers)
        best_out = min(latest[n] for n in outside)
        assert worst_in <= best_out, (
            f"window filler has latest-clean round {worst_in} but a "
            f"staler query (round {best_out}) sits outside: "
            f"{sorted(n for n in outside if latest[n] == best_out)}"
        )
