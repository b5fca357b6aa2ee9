"""Round-11 scale pins, continuing the round-9/10 discipline: the new
KMV distinct-n-gram twin's per-n top-k must compile to Catalyst's
two-level WindowGroupLimit — the PARTIAL pass keeps each map task's k
smallest hashes per n BEFORE the exchange, so the per-n reducer never
receives the full distinct-hash frame."""

from __future__ import annotations

from concept_multi_db_query_engine_spark import operators as ops
from concept_multi_db_query_engine_spark import testdata

SF_DIR = "/root/testdata/sf0.001"


def executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def unpartitioned_window_lines(plan: str) -> list[str]:
    bad = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: *(0123456789)").strip()
        if s.startswith("Window [") and s.count("], [") < 2:
            bad.append(line)
    return bad


class TestKmvNgramTwoLevelTopK:
    def test_group_limit_runs_partial_before_exchange(self, spark):
        docs = testdata.load_table(spark, SF_DIR, "documents")
        df = ops.distinct_ngram_diversity_approx(docs, max_n=2, k=64)
        plan = executed(df)
        # no un-partitioned window anywhere
        bad = unpartitioned_window_lines(plan)
        assert not bad, "\n".join(bad)
        # the rank <= k filter must compile to the two-level
        # WindowGroupLimit: a PARTIAL map-side top-k per n before the
        # shuffle, then the Final pass — the reducer for a kind sees
        # <= k * n_tasks hashes, never the full distinct frame
        assert "WindowGroupLimit" in plan, plan
        assert ", Partial" in plan, plan
        assert ", Final" in plan, plan
