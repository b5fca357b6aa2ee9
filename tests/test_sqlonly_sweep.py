"""sql-only renderer sweep: for EVERY engine-DSL definition in the driver
entry file, the rendered Spark SQL text (params substituted) executed via
spark.sql over the same tables must return exactly the rows the DataFrame
builder path returns. Renderer and builder share one ResolvedPlan; this
proves the textual rendering itself doesn't drift either."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from concept_multi_db_query_engine_spark import testdata

SF_DIR = "/root/testdata/sf0.001"

# masking_role excluded: masking is applied post-query, not in the SQL text
# (the reference behaves the same — masking intent is meta-only in sql mode)
SWEEP = sorted(n for n in entry_mod._DSL if n != "masking_role")


def _substitute(sql: str, params) -> str:
    import datetime as dt

    for p in params:
        if isinstance(p, str):
            lit = "'" + p.replace("'", "''") + "'"
        elif isinstance(p, bool):
            lit = "true" if p else "false"
        elif p is None:
            lit = "NULL"
        elif isinstance(p, dt.datetime):
            lit = f"TIMESTAMP '{p.isoformat(sep=' ')}'"
        elif isinstance(p, dt.date):
            lit = f"DATE '{p.isoformat()}'"
        else:
            lit = str(p)
        sql = sql.replace("?", lit, 1)
    return sql


@pytest.fixture(scope="module")
def env(spark):
    engine = testdata.build_engine(spark, SF_DIR)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        testdata.load_table(spark, SF_DIR, t).createOrReplaceTempView(t)
    # replica physical names resolve to the same data in the fixture world
    testdata.load_table(spark, SF_DIR, "orders") \
        .createOrReplaceTempView("orders_replica")
    testdata.load_table(spark, SF_DIR, "customer") \
        .createOrReplaceTempView("customer_replica")
    # doc_terms is the derived view over documents (testdata.normalize_table)
    testdata.normalize_table(
        "doc_terms", testdata.load_table(spark, SF_DIR, "documents")
    ).createOrReplaceTempView("doc_terms")
    return engine


@pytest.mark.parametrize("name", SWEEP)
def test_rendered_sql_matches_builder(name, spark, env):
    engine = env
    defn = entry_mod._DSL[name]
    import decimal

    def canon(v):
        # the row API surfaces avg as Decimal (QUERY.md:173) while raw SQL
        # returns double; collapse both to float for the drift comparison
        return float(v) if isinstance(v, decimal.Decimal) else v

    res = engine.query({**defn, "executeMode": "sql-only"})
    sql = _substitute(res["sql"], res["params"])
    via_sql = [tuple(canon(v) for v in r) for r in spark.sql(sql).collect()]
    via_builder = [
        tuple(canon(v) for v in r.values()) for r in engine.query(defn)["data"]
    ]
    assert sorted(map(repr, via_sql)) == sorted(map(repr, via_builder)), (
        f"{name}: sql-text path diverges from builder path\nSQL: {sql}"
    )
