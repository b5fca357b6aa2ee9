"""Partition-aware scan posture (SURVEY §7.2 item 12): a DSL filter on a
partition column must become a PartitionFilter on the parquet scan — the
scan reads only the matching year directories, which is the difference
between touching 1/NYEARS of a 100 TB table and touching all of it.

The driver testdata is unpartitioned files, so this writes a
year-partitioned copy of orders once per module and serves it through the
same ParquetSource + MultiDb path the rest of the engine uses."""

from __future__ import annotations

import copy

import pytest
from pyspark.sql import functions as F

from concept_multi_db_query_engine_spark import (
    MultiDb,
    ParquetSource,
    SourceRegistry,
)
from concept_multi_db_query_engine_spark import testdata as td

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def part_engine(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("partlake")
    (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .parquet(str(out / "orders_part.parquet"))
    )
    meta = copy.deepcopy(td.METADATA)
    meta["databases"].append({"id": "partlake", "engine": "spark"})
    orders_meta = next(
        t for t in meta["tables"] if t["id"] == "orders"
    )
    part_meta = copy.deepcopy(orders_meta)
    part_meta.update(id="orders_part", apiName="orders_part",
                     database="partlake", physicalName="orders_part",
                     relations=[])
    part_meta["columns"] = part_meta["columns"] + [
        {"apiName": "o_year", "physicalName": "o_year", "type": "int"},
    ]
    meta["tables"].append(part_meta)
    registry = SourceRegistry({
        "warehouse": ParquetSource(SF_DIR),
        "lake": ParquetSource(
            SF_DIR,
            aliases={"orders_replica": "orders",
                     "customer_replica": "customer",
                     "doc_terms": "documents"},
            post=td.normalize_table,
        ),
        "partlake": ParquetSource(str(out)),
    })
    return MultiDb(spark, meta, td.ROLES, registry,
                   strict_api_names=False)


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_year_filter_becomes_partition_filter(part_engine):
    df = part_engine.dataframe({
        "from": "orders_part",
        "columns": ["o_orderkey", "o_totalprice"],
        "filters": [{"column": "o_year", "operator": "=", "value": 1995}],
    })
    plan = _executed(df)
    scan = next(ln for ln in plan.splitlines() if "FileScan" in ln)
    assert "PartitionFilters" in scan
    # the predicate must appear in PartitionFilters, not as a post-scan
    # data filter: only the year=1995 directories are read
    pf = scan.split("PartitionFilters: [")[1].split("]")[0]
    assert "o_year" in pf and "1995" in pf
    rows = df.collect()
    assert rows and all(r["o_orderkey"] is not None for r in rows)


def test_year_range_and_in_also_prune(part_engine):
    for flt in (
        {"column": "o_year", "operator": ">=", "value": 1997},
        {"column": "o_year", "operator": "in", "value": [1995, 1996]},
    ):
        df = part_engine.dataframe({
            "from": "orders_part", "columns": ["o_orderkey"],
            "filters": [flt],
        })
        scan = next(ln for ln in _executed(df).splitlines()
                    if "FileScan" in ln)
        pf = scan.split("PartitionFilters: [")[1].split("]")[0]
        assert "o_year" in pf, scan


def test_unfiltered_scan_has_empty_partition_filters(part_engine):
    # sanity: the pruning assertions above aren't vacuous string matches
    df = part_engine.dataframe({
        "from": "orders_part", "columns": ["o_orderkey"],
    })
    scan = next(ln for ln in _executed(df).splitlines()
                if "FileScan" in ln)
    pf = scan.split("PartitionFilters: [")[1].split("]")[0]
    assert pf.strip() == ""
