"""Replicates the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB over the same sf parquet, then
compare row counts + order-insensitive values EXACTLY (doubles included — the
decimal-cast convention makes aggregates bit-identical)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def canon(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return value
    if hasattr(value, "isoformat"):
        return value.isoformat()
    return value


def rows_of_spark(df):
    cols = sorted(df.columns)
    # key=repr gives a total order even when tuples contain None/mixed
    # types (None < int comparisons raise TypeError under the default key)
    return sorted(
        (tuple(canon(r[c]) for c in cols) for r in df.collect()), key=repr
    ), cols


def rows_of_duck(con, sql):
    rel = con.sql(sql)
    cols = sorted(rel.columns)
    idx = [rel.columns.index(c) for c in cols]
    return sorted(
        (tuple(canon(r[i]) for i in idx) for r in rel.fetchall()), key=repr
    ), cols


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    got, got_cols = rows_of_spark(df)
    want, want_cols = rows_of_duck(duck, ORACLES[name])
    assert got_cols == want_cols, f"{name}: columns {got_cols} != {want_cols}"
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} != {len(want)}"
    )
    mismatches = [
        (i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: "
        f"{mismatches[:3]}"
    )


# Since round 4 every registered query has a DuckDB oracle: dedup_simhash
# gates on the md5-derived 60-bit hash, multimodal_decode_stats' stub stats
# are deterministic blob functions, and sketch_distinct_comparison gates on
# its KMV-vs-exact core (the HLL++ column is tolerance-tested separately).
NO_ORACLE_ALLOWED: set[str] = set()


def test_every_query_has_oracle():
    no_oracle = set(QUERIES) - set(ORACLES)
    assert no_oracle <= NO_ORACLE_ALLOWED


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
