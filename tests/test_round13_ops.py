"""Round-13: probe-tax knobs (known_groups/known_domains skip the
cardinality probe scan) + the round-13 capability wave."""

from __future__ import annotations

import pytest

from concept_multi_db_query_engine_spark import operators as ops


def _jobs_during(spark, fn):
    """Number of Spark jobs submitted while fn runs (group None)."""
    tracker = spark.sparkContext.statusTracker()

    def _max_id():
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    before = _max_id()
    out = fn()
    return _max_id() - before, out


class TestProbeSkip:
    def test_jonckheere_known_groups_runs_zero_probe_jobs(self, spark):
        """The verdict's 'done' criterion: a pre-declared cardinality
        runs ZERO probe jobs — the job-count delta between the probe
        path and the known-groups path equals exactly the job count of
        the standalone distinct+limit probe collect."""
        from pyspark.sql import functions as F

        rows = [(s, float(s * 10 + i % 5))
                for s in (1, 2, 3) for i in range(25)]
        df = spark.createDataFrame(rows, "s long, v double")
        n_probe, _ = _jobs_during(
            spark, lambda: ops.jonckheere_terpstra(df, "s", "v"))
        n_known, _ = _jobs_during(
            spark, lambda: ops.jonckheere_terpstra(
                df, "s", "v", known_groups=[1, 2, 3]))
        n_standalone, _ = _jobs_during(
            spark, lambda: df.select(
                F.expr("CAST(s AS BIGINT)").alias("g"))
            .distinct().limit(101).collect())
        assert n_standalone >= 1
        assert n_probe - n_known == n_standalone

    def test_dunns_known_groups_skips_probe_jobs(self, spark):
        rows = [(g, float(i % 7 + ord(g[0]) % 5))
                for g in ("a", "b", "c") for i in range(30)]
        df = spark.createDataFrame(rows, "g string, v double")
        n_probe, probed = _jobs_during(
            spark, lambda: ops.dunns_test(df, "g", "v"))
        n_known, known = _jobs_during(
            spark, lambda: ops.dunns_test(
                df, "g", "v", known_groups=["a", "b", "c"]))
        # the pre-declared cardinality removes the probe's
        # distinct+limit jobs from construction
        assert n_known < n_probe
        assert known.collect() == probed.collect()

    def test_bradley_terry_known_groups_matches_probe_path(self, spark):
        rows = [("a", 3.0), ("b", 1.0), ("a", 5.0), ("c", 2.0),
                ("b", 4.0), ("c", 6.0), ("a", 2.5), ("b", 2.5)]
        df = spark.createDataFrame(rows, "g string, v double")
        n_probe, probed = _jobs_during(
            spark, lambda: ops.bradley_terry(df, "g", "v", iterations=5))
        n_known, known = _jobs_during(
            spark, lambda: ops.bradley_terry(
                df, "g", "v", iterations=5,
                known_groups=["a", "b", "c"]))
        assert n_known < n_probe
        assert known.collect() == probed.collect()

    def test_elo_known_groups_matches_probe_path(self, spark):
        rows = [(i, "ab"[i % 2], float((i * 7) % 11)) for i in range(40)]
        df = spark.createDataFrame(rows, "o long, g string, v double")
        probed = ops.elo_preference_ratings(
            df, "g", "v", "o", n_matches=100).collect()
        known = ops.elo_preference_ratings(
            df, "g", "v", "o", n_matches=100,
            known_groups=["a", "b"]).collect()
        assert known == probed

    def test_jonckheere_known_groups_matches_probe_path(self, spark):
        rows = [(s, float(s * 10 + i % 5))
                for s in (1, 2, 3) for i in range(25)]
        df = spark.createDataFrame(rows, "s long, v double")
        probed = ops.jonckheere_terpstra(df, "s", "v").collect()
        known = ops.jonckheere_terpstra(
            df, "s", "v", known_groups=[1, 2, 3]).collect()
        assert known == probed

    def test_doremi_known_domains_matches_probe_path(self, spark):
        rows = [(i, "web" if i % 2 else "code",
                 ("def main" if i % 2 == 0 else "the quick fox") * 3)
                for i in range(30)]
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string")
        probed = ops.doremi_mixture_weights(docs, iterations=3).collect()
        known = ops.doremi_mixture_weights(
            docs, iterations=3,
            known_domains=["web", "code"]).collect()
        assert known == probed

    def test_known_groups_over_bound_raises(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("b", 2.0)], "g string, v double")
        with pytest.raises(ValueError, match="known_groups"):
            ops.bradley_terry(df, "g", "v",
                              known_groups=[str(i) for i in range(30)])
        with pytest.raises(ValueError, match="known_groups"):
            ops.dunns_test(df, "g", "v", max_groups=3,
                           known_groups=["a", "b", "c", "d"])
