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


def _write_round(tmpdir: str, rnd: int, rows: dict) -> None:
    with open(os.path.join(tmpdir, f"CORRECTNESS_r{rnd:02d}.json"), "w") as fh:
        json.dump(rows, fh)


def _green_row():
    return {"rows_match": True, "schema_match": True, "hash_match": True}


def _red_row():
    return {"rows_match": True, "schema_match": True, "hash_match": False}


def test_gate_order_tiers(tmp_path):
    """Reds lead, never-graded follow, greens rotate stalest-first —
    each tier stable by registry insertion order."""
    d = str(tmp_path)
    _write_round(d, 1, {"g_old": _green_row(), "red1": _red_row()})
    _write_round(d, 2, {"g_new": _green_row(), "red1": _red_row()})
    names = ["g_new", "new_b", "red1", "g_old", "new_a"]
    order = entry_mod._gate_order(names, repo_dir=d)
    assert order == ["red1", "new_b", "new_a", "g_old", "g_new"]


def test_gate_order_recomputes_after_post_commit_grading(tmp_path):
    """The round-9 failure mode: the driver writes its CORRECTNESS file
    AFTER the final commit, flipping window rows green. A hardcoded
    priority list is stale at judge time; the self-computing order must
    move freshly-greened rows behind the still-unproven ones on the
    very next call — no code change, no commit."""
    d = str(tmp_path)
    names = [f"q{i:03d}" for i in range(120)]
    _write_round(d, 9, {n: _green_row() for n in names[:60]})
    before = entry_mod._gate_order(names, repo_dir=d)
    assert before[:60] == names[60:]  # unproven lead
    # driver grades the current window post-commit: 50 more flip green
    _write_round(d, 10, {n: _green_row() for n in names[60:110]})
    after = entry_mod._gate_order(names, repo_dir=d)
    assert after[:10] == names[110:]  # still-unproven lead immediately
    greens = after[10:]
    # stalest grades rotate first: round-9 greens precede round-10 greens
    assert greens[:60] == names[:60] and greens[60:] == names[60:110]


def test_gate_order_tolerates_malformed_files(tmp_path):
    d = str(tmp_path)
    _write_round(d, 1, {"a": _green_row(), "junk": "not-a-dict"})
    with open(os.path.join(d, "CORRECTNESS_r02.json"), "w") as fh:
        fh.write("{broken json")
    with open(os.path.join(d, "CORRECTNESS_rXX.json"), "w") as fh:
        fh.write("{}")
    order = entry_mod._gate_order(["a", "b", "junk"], repo_dir=d)
    assert order == ["b", "junk", "a"]


def test_gate_order_null_hash_rows_stay_unproven(tmp_path):
    # a rows-only grade (hash_match null — oracle-less weak check) is
    # evidence of grading, not of correctness: keep it in the red tier
    d = str(tmp_path)
    _write_round(d, 1, {"weak": {
        "rows_match": True, "schema_match": True, "hash_match": None,
    }})
    assert entry_mod._gate_order(["x", "weak"], repo_dir=d) == ["weak", "x"]
