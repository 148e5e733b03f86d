"""Driver-window registry invariants (queries/__init__.py): the driver
evaluates the FIRST 50 registered entries each round, so ordering bugs
silently cost a whole round of verification (rounds 3-4 lesson).
"""

from __future__ import annotations

import pinot_spark.queries as Q


def test_window_priority_all_registered():
    missing = [n for n in Q._WINDOW_PRIORITY if n not in Q.QUERIES]
    assert not missing, f"window names not in registry: {missing}"


def test_window_is_exactly_the_front():
    front = list(Q.QUERIES)[: len(Q._WINDOW_PRIORITY)]
    assert front == [n for n in Q._WINDOW_PRIORITY if n in Q.QUERIES]


def test_window_has_50_slots():
    assert len(Q._WINDOW_PRIORITY) == 50


def test_verified_set_disjoint_from_window():
    overlap = set(Q._WINDOW_PRIORITY) & set(Q._VERIFIED_PRIOR_ROUNDS)
    assert not overlap, f"window re-proves already-verified queries: {overlap}"


def test_verified_names_all_registered():
    missing = [n for n in Q._VERIFIED_PRIOR_ROUNDS if n not in Q.QUERIES]
    assert not missing


def test_verified_parked_at_back():
    back = list(Q.QUERIES)[-len(Q._VERIFIED_PRIOR_ROUNDS) :]
    assert set(back) == set(Q._VERIFIED_PRIOR_ROUNDS)


def test_every_query_has_callable_and_most_have_oracles():
    for name in Q.ORACLE:
        assert name in Q.QUERIES
    rows_only = [n for n in Q.QUERIES if n not in Q.ORACLE]
    # rows-only is reserved for genuinely non-SQL-expressible operators;
    # growth here needs a justification in the query's docstring
    assert len(rows_only) <= 10, rows_only


def test_window_covers_stalest_rows():
    """VERDICT r12 item 6 (evidence-freshness automation): recompute
    per-query staleness from the committed CORRECTNESS_r*.json artifacts
    and assert the recorded window (a) takes every never-driver-tested
    registered query as a first-timer and (b) fills its re-proof slots
    with the STALEST greens — an out-of-window green may never be
    strictly staler than an in-window re-proof, so a planning slip can't
    silently strand a row at an old round again (the r8 fn_math_family
    near-miss)."""
    import glob
    import json
    import re

    by_round: dict[int, dict[str, bool]] = {}
    files = sorted(glob.glob("CORRECTNESS_r*.json"))
    assert files, "run from the repo root (driver artifacts expected)"
    for f in files:
        rnd = int(re.search(r"r(\d+)", f).group(1))
        rows = by_round.setdefault(rnd, {})
        for name, res in json.load(open(f)).items():
            rows[name] = (
                isinstance(res, dict)
                and bool(res.get("rows_match"))
                and bool(res.get("schema_match"))
                and not res.get("err")
                and res.get("hash_match") in (True, None)
            )
    registered = set(Q.QUERIES)
    window = set(Q._WINDOW_PRIORITY)

    # Landing-aware semantics (VERDICT r13 item 1): the driver's newest
    # artifact is, by construction, the execution of the committed
    # window.  When the newest round's green set is still a subset of
    # the committed window, the rotation for the NEXT round simply
    # hasn't been committed yet — evaluate freshness as of the previous
    # round so the gate is not red by design between every driver run
    # and the rotation commit.  If the SECOND-newest round's greens are
    # ALSO a subset of the window, the same window executed twice: a
    # rotation was actually skipped, and that stays a failure.
    rounds = sorted(by_round)
    if len(rounds) >= 2:
        newest = rounds[-1]
        newest_greens = {
            n for n, ok in by_round[newest].items() if ok and n in registered
        }
        if newest_greens and newest_greens <= window:
            prev_greens = {
                n
                for n, ok in by_round[rounds[-2]].items()
                if ok and n in registered
            }
            assert not (prev_greens and prev_greens <= window), (
                f"rounds {rounds[-2]} and {newest} both executed the "
                f"committed window — a rotation was skipped"
            )
            del by_round[newest]
            rounds = rounds[:-1]

    latest: dict[str, tuple[int, bool]] = {}
    for rnd in rounds:
        for name, ok in by_round[rnd].items():
            latest[name] = (rnd, ok)
    never_tested = registered - set(latest)
    assert never_tested <= window, (
        f"never-driver-tested queries missing a first-timer slot: "
        f"{sorted(never_tested - window)}"
    )
    greens = {
        n: r for n, (r, ok) in latest.items() if ok and n in registered
    }
    in_window = {greens[n] for n in window & set(greens)}
    out_window = {greens[n] for n in set(greens) - window}
    if in_window and out_window:
        assert max(in_window) <= min(out_window), (
            f"window re-proves round-{max(in_window)} greens while "
            f"round-{min(out_window)} greens sit outside it"
        )
