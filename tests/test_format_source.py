"""FormatSource: csv/json landing-zone databases behind the same source
contract as ParquetSource — full pipeline on top, explicit schemas (no
inference scan), column pruning visible in the executed csv scan."""

from __future__ import annotations

import pytest

from concept_multi_db_query_engine_spark import (
    FormatSource,
    MultiDb,
    SourceRegistry,
)

from tests import fixtures

ADMIN = {"roles": {"user": ["admin"]}}


@pytest.fixture(scope="module")
def format_fix(spark, tmp_path_factory):
    """The fixture orders table re-exported as csv and json (complex-typed
    columns dropped — csv cannot carry arrays), plus its DDL schema."""
    base = fixtures.build_registry(spark)
    root = tmp_path_factory.mktemp("fmt_src")
    orders = base.df(spark, "pg-main", "orders")
    scalar = [f.name for f in orders.schema.fields
              if f.dataType.typeName() not in ("array", "map", "struct")]
    orders = orders.select(*scalar)
    ddl = orders._jdf.schema().toDDL()
    orders.coalesce(1).write.option("header", True).mode("overwrite").csv(
        str(root / "orders.csv")
    )
    orders.coalesce(1).write.mode("overwrite").json(str(root / "orders.json"))
    return str(root), ddl


def _engine(spark, source):
    registry = fixtures.build_registry(spark)
    registry.sources["pg-main"] = source
    return MultiDb(spark, fixtures.METADATA, fixtures.ROLES,
                   sources=registry)


def _q():
    return {"from": "orders", "columns": ["id", "total", "status"],
            "sort": [{"column": "id", "order": "asc"}], "limit": 50}


def test_csv_database_runs_the_full_pipeline(spark, format_fix):
    root, ddl = format_fix
    src = FormatSource(root, "csv", schemas={"orders": ddl},
                       options={"header": "true"})
    rows = _engine(spark, src).query({
        "from": "orders", "columns": ["id", "status"],
        "filters": [{"column": "status", "operator": "=",
                     "value": "shipped"}],
    }, ADMIN)["data"]
    assert rows and all(r["status"] == "shipped" for r in rows)


def test_csv_and_parquet_paths_agree(spark, format_fix):
    root, ddl = format_fix
    src = FormatSource(root, "csv", schemas={"orders": ddl},
                       options={"header": "true"})
    via_csv = _engine(spark, src).query(_q(), ADMIN)["data"]
    via_fixture = MultiDb(spark, fixtures.METADATA, fixtures.ROLES,
                          sources=fixtures.build_registry(spark)).query(
        _q(), ADMIN)["data"]
    assert via_csv == via_fixture


def test_json_database_agrees_too(spark, format_fix):
    root, ddl = format_fix
    src = FormatSource(root, "json", schemas={"orders": ddl})
    via_json = _engine(spark, src).query(_q(), ADMIN)["data"]
    via_fixture = MultiDb(spark, fixtures.METADATA, fixtures.ROLES,
                          sources=fixtures.build_registry(spark)).query(
        _q(), ADMIN)["data"]
    assert via_json == via_fixture


def test_csv_scan_prunes_columns(spark, format_fix):
    root, ddl = format_fix
    src = FormatSource(root, "csv", schemas={"orders": ddl},
                       options={"header": "true"})
    df = _engine(spark, src).dataframe({"from": "orders", "columns": ["id"]})
    df.collect()
    full = df._jdf.queryExecution().executedPlan().toString()
    read = [ln for ln in full.splitlines() if "ReadSchema" in ln]
    assert read and "id" in read[0]
    assert "total_amount" not in read[0]


def test_text_formats_require_schema(spark, format_fix):
    root, _ = format_fix
    src = FormatSource(root, "csv")
    with pytest.raises(ValueError, match="explicit schema"):
        src.df(spark, "orders")


def test_sink_roundtrip_in_csv(spark, tmp_path):
    from concept_multi_db_query_engine_spark.sinks import ParquetSink

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double"
    )
    path = str(tmp_path / "out.csv")
    ParquetSink(path=path, fmt="csv", compression="none",
                options={"header": "true"}).write(df)
    back = FormatSource(str(tmp_path), "csv",
                        schemas={"out": "id long, s string, v double"},
                        options={"header": "true"}, ext="csv").df(spark, "out")
    assert sorted(r["id"] for r in back.collect()) == [1, 2]


def test_sink_roundtrip_in_orc(spark, tmp_path):
    from concept_multi_db_query_engine_spark.sinks import ParquetSink

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double"
    )
    path = str(tmp_path / "out.orc")
    ParquetSink(path=path, fmt="orc").write(df)
    back = FormatSource(str(tmp_path), "orc").df(spark, "out")
    assert sorted(r["id"] for r in back.collect()) == [1, 2]


def test_compact_files_reduces_file_count(spark, tmp_path):
    from concept_multi_db_query_engine_spark.sinks import compact_files

    path = str(tmp_path / "frag")
    # fragment: 64 tiny files
    spark.range(0, 10_000).repartition(64).write.parquet(path)
    before = spark.read.parquet(path)
    checksum = before.agg({"id": "sum"}).collect()[0][0]
    stats = compact_files(spark, path, target_mb=512)
    assert stats["files_before"] >= 64
    assert stats["files_after"] == 1  # tiny data -> one target file
    after = spark.read.parquet(path)
    assert after.count() == 10_000
    assert after.agg({"id": "sum"}).collect()[0][0] == checksum


def test_read_parquet_schema_memo(spark, tmp_path):
    """The process-level schema memo: the first read of a path infers
    (and caches) the schema; later reads pass it explicitly — zero
    inference jobs — and return identical schemas and rows."""
    from concept_multi_db_query_engine_spark import sources as src

    p = str(tmp_path / "memo.parquet")
    spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(p)
    first = src.read_parquet(spark, p)
    assert any(k[0] == p for k in src._PARQUET_SCHEMA_CACHE)
    tracker = spark.sparkContext.statusTracker()
    ids = tracker.getJobIdsForGroup(None)
    before = max(ids) if ids else -1
    again = src.read_parquet(spark, p)
    ids = tracker.getJobIdsForGroup(None)
    assert (max(ids) if ids else -1) == before  # no inference job
    assert again.schema == first.schema
    assert sorted(r["v"] for r in again.collect()) == \
        sorted(r["v"] for r in first.collect())


def test_read_parquet_schema_memo_invalidates_on_overwrite(spark, tmp_path):
    """Overwriting a path (here with a RENAMED column) within one driver
    process must invalidate the memo: the second read sees the new
    schema instead of null-filling through the stale StructType."""
    from concept_multi_db_query_engine_spark import sources as src

    p = str(tmp_path / "evolving.parquet")
    spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(p)
    first = src.read_parquet(spark, p)
    assert set(first.columns) == {"id", "v"}
    assert first.count() == 10
    spark.range(5).selectExpr("id", "id * 3 AS w").write.mode(
        "overwrite").parquet(p)
    second = src.read_parquet(spark, p)
    assert set(second.columns) == {"id", "w"}  # not a stale null-filled v
    assert sorted(r["w"] for r in second.collect()) == [0, 3, 6, 9, 12]
    # explicit invalidation hook is also exposed
    src.invalidate_schema_cache(p)
    assert not any(k[0] == p for k in src._PARQUET_SCHEMA_CACHE)


def test_schema_memo_fingerprint_sees_deep_partition_rewrite(
        spark, tmp_path, monkeypatch):
    """A rewrite two directory levels down (multi-level partitioned
    layout, a=1/b=2/part-*.parquet) changes only the grandchild dir's
    mtime — the top-level dir's own stat and its direct children are
    untouched — so the fingerprint must walk the full tree to catch it
    (round-13 ADVICE). Past the walk cap the memo is disabled outright
    rather than keyed on a truncated, stale-replayable view."""
    import os

    from concept_multi_db_query_engine_spark import sources as src

    p = str(tmp_path / "deep.parquet")
    spark.range(20).selectExpr(
        "id", "id % 2 AS a", "id % 3 AS b").write.partitionBy(
        "a", "b").parquet(p)
    fp1 = src._path_fingerprint(p)
    assert fp1 != ("no-memo",)
    # sanity: the rewrite below must be invisible to a direct-children-
    # only view, else this test wouldn't exercise the recursion
    top_before = sorted(
        (e.name, e.stat().st_mtime_ns) for e in os.scandir(p))
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    leaf = glob.glob(os.path.join(p, "a=1", "b=2", "part-*.parquet"))[0]
    pq.write_table(pa.table({"id": pa.array([99], pa.int64())}), leaf)
    assert sorted((e.name, e.stat().st_mtime_ns)
                  for e in os.scandir(p)) == top_before
    fp2 = src._path_fingerprint(p)
    assert fp2 != fp1  # deep rewrite invalidates the memo key
    # bounded walk: a tree past the stat cap opts out of the memo
    monkeypatch.setattr(src, "_FP_MAX_ENTRIES", 2)
    assert src._path_fingerprint(p) == ("no-memo",)
