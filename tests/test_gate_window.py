"""Pins the driver-facing gate composition: the correctness gate grades
the FIRST 50 ``queries()`` entries each round. Rounds 6-8 all hit the
same recurrence — newly-added operators queued *behind* the window and
went a full round without driver evidence. The fix is the mechanical
invariant below, recomputed from the ``CORRECTNESS_r*.json`` files on
disk every run (the round-8 verdict explicitly killed the hardcoded
snapshot variant of this test — it went stale the moment the driver
graded): every registry query without a GREEN driver row in any round
must occupy the front of the grading window, and when those outnumber
the 50 slots the overflow must sit directly behind the window so it
leads the next round's grading. "Green" (not merely "graded") is the
bar — a row whose only grade is red (round 8's ``orders_incremental_
state`` hash mismatch) still needs driver evidence and must not lose
its slot to an already-proven row."""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entry_mod

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WINDOW = 50


def _row_green(row: dict) -> bool:
    return (
        bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        and bool(row.get("hash_match", True))
    )


def _ever_green() -> set[str]:
    green: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            rows = json.load(fh)
        green |= {name for name, row in rows.items() if _row_green(row)}
    return green


def test_every_query_has_an_oracle():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(q) == set(o), (
        f"missing oracles: {sorted(set(q) - set(o))}; "
        f"orphan oracles: {sorted(set(o) - set(q))}"
    )


def test_unproven_queries_lead_the_window():
    """The end-of-round invariant, enforced mechanically from disk state:
    queries with no green driver row ever must fill the grading window
    front-to-back, and any overflow must sit immediately after the
    window — never queued behind rows that already have green evidence."""
    q = list(entry_mod.queries())
    green = _ever_green()
    unproven = [n for n in q if n not in green]
    front = q[:_WINDOW]
    if len(unproven) <= _WINDOW:
        missing = [n for n in unproven if n not in set(front)]
        assert not missing, (
            f"queries without a green driver row queued behind the "
            f"{_WINDOW}-entry grading window: {missing} — move them to "
            "the front of _GATE_PRIORITY before the round ends"
        )
    else:
        wasted = [n for n in front if n in green]
        assert not wasted, (
            f"{len(unproven)} unproven queries compete for {_WINDOW} "
            f"slots, yet already-green rows hold slots: {wasted}"
        )
        tail = q[_WINDOW:len(unproven)]
        stuck = [n for n in tail if n in green]
        assert not stuck, (
            f"unproven overflow must lead the next-round queue, but "
            f"already-green rows precede it: {stuck}"
        )


def test_gate_priority_names_are_real_and_unique():
    # `ordered = {n: out.pop(n) for n in _GATE_PRIORITY if n in out}`
    # silently ignores unknown names — a typo would quietly drop a row
    # out of its intended grading slot. (Rows absent from the list
    # simply rotate as the dict tail.)
    q = set(entry_mod.queries())
    prio = list(entry_mod._GATE_PRIORITY)
    unknown = [n for n in prio if n not in q]
    assert not unknown, f"typo'd names in _GATE_PRIORITY: {unknown}"
    dupes = {n for n in prio if prio.count(n) > 1}
    assert not dupes, f"duplicate names in _GATE_PRIORITY: {dupes}"
