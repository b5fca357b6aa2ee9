"""Property-based checks for the round-5 text/profiling operators against
independent Python reference implementations: pii_scrub vs `re` (Python's
leftmost-first matching agrees with Java regex for the alternation-free
pattern set), numeric_histogram vs a Counter over the same floor formula,
line_dedup vs a dict-based reimplementation. Few examples, batch-per-example
frames — each example is one tiny local Spark job."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from concept_multi_db_query_engine_spark import operators as ops
from concept_multi_db_query_engine_spark.operators.text import PII_PATTERNS

_SETTINGS = dict(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_text = st.text(
    alphabet="ab @.+-015x\n", min_size=0, max_size=60,
)


@given(texts=st.lists(_text, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_pii_scrub_matches_python_re(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in ops.pii_scrub(docs).collect()}
    for i, t in enumerate(texts):
        for name, (rx, _) in PII_PATTERNS.items():
            assert got[i][f"n_{name}"] == len(re.findall(rx, t)), (name, t)
        expect_clean = t
        for _, (rx, tok) in PII_PATTERNS.items():
            expect_clean = re.sub(rx, tok, expect_clean)
        assert got[i]["clean_text"] == expect_clean, t


@given(
    vals=st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False,
                  allow_infinity=False),
        min_size=1, max_size=40,
    ),
    width=st.sampled_from([0.5, 1.0, 7.0, 250.0]),
)
@settings(**_SETTINGS)
def test_histogram_matches_python_reference(spark, vals, width):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r["bin_start"]: r for r in
           ops.numeric_histogram(df, "x", width).collect()}
    expect = Counter(round(math.floor(v / width) * width, 2) for v in vals)
    assert {k: r["n"] for k, r in got.items()} == dict(expect)
    total = len(vals)
    for k, r in got.items():
        assert r["share"] == expect[k] / total


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.sampled_from(["aa", "bb", "cc", "dd"])),
        min_size=1, max_size=25, unique=True,
    ),
    min_docs=st.sampled_from([2, 3]),
)
@settings(**_SETTINGS)
def test_line_dedup_matches_python_reference(spark, rows, min_docs):
    # unique (doc, line-text) tuples; line_no = per-doc position
    per_doc: dict[int, list[str]] = defaultdict(list)
    for d, line in rows:
        per_doc[d].append(line)
    flat = [(d, i, line) for d, lines in per_doc.items()
            for i, line in enumerate(lines)]
    df = spark.createDataFrame(flat, "doc_id long, line_no long, line string")
    got = {r["doc_id"]: r for r in ops.line_dedup(df, min_docs).collect()}

    doc_freq = Counter()
    for d, lines in per_doc.items():
        for line in set(lines):
            doc_freq[line] += 1
    dropped = {ln for ln, c in doc_freq.items() if c >= min_docs}
    for d, lines in per_doc.items():
        kept = [ln for ln in lines if ln not in dropped]
        assert got[d]["n_lines_kept"] == len(kept)
        assert got[d]["clean_text"] == "\n".join(kept)
    assert set(got) == set(per_doc)


@given(
    steps=st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["a", "b", "c"])),
        min_size=1, max_size=20,
    ),
)
@settings(**_SETTINGS)
def test_transitions_match_python_reference(spark, steps):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), u, t, 0.0, "{}")
        for i, (u, t) in enumerate(steps)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {(r["prev_type"], r["next_type"]): r
           for r in ops.event_transitions(ev).collect()}

    per_user = defaultdict(list)
    for i, (u, t) in enumerate(steps):
        per_user[u].append((i, t))  # already time-ordered by construction
    pair_n = Counter()
    pair_users = defaultdict(set)
    for u, seq in per_user.items():
        for (_, a), (_, b) in zip(seq, seq[1:]):
            pair_n[(a, b)] += 1
            pair_users[(a, b)].add(u)
    totals = Counter()
    for (a, _), n in pair_n.items():
        totals[a] += n
    assert set(got) == set(pair_n)
    for k, n in pair_n.items():
        assert got[k]["n_transitions"] == n
        assert got[k]["n_users"] == len(pair_users[k])
        assert got[k]["share_of_source"] == n / totals[k[0]]


@given(
    baskets=st.lists(
        st.tuples(st.integers(0, 4), st.sampled_from(["a", "b", "c", "d"])),
        min_size=1, max_size=20,
    ),
)
@settings(**_SETTINGS)
def test_cooccurrence_matches_python_reference(spark, baskets):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1), u, t, 0.0, "{}")
        for i, (u, t) in enumerate(baskets)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {(r["type_a"], r["type_b"]): r
           for r in ops.event_cooccurrence(ev).collect()}

    per_user = defaultdict(set)
    for u, t in baskets:
        per_user[u].add(t)
    n_users = len(per_user)
    type_n = Counter()
    pair_n = Counter()
    for u, ts in per_user.items():
        for t in ts:
            type_n[t] += 1
        ts = sorted(ts)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                pair_n[(ts[i], ts[j])] += 1
    assert set(got) == set(pair_n)
    for (a, b), n in pair_n.items():
        r = got[(a, b)]
        assert r["n_both"] == n
        assert r["support"] == n / n_users
        assert r["confidence_a_to_b"] == n / type_n[a]
        assert r["lift"] == (n * n_users) / (type_n[a] * type_n[b])
