"""Write-path (sinks) and sketch-operator tests."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from concept_multi_db_query_engine_spark import operators as ops
from concept_multi_db_query_engine_spark.sinks import (
    ParquetSink,
    write_corpus_shards,
)


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )


def test_corpus_shards_roundtrip_and_hive_layout(spark, tmp_path):
    out = str(tmp_path / "corpus")
    docs = _docs(spark)
    write_corpus_shards(docs, out, n_shards=4)
    assert sorted(os.path.basename(p) for p in glob.glob(f"{out}/lang=*")) \
        == ["lang=de", "lang=en"]
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert {r["lang"] for r in back.select("lang").distinct().collect()} \
        == {"en", "de"}
    # partition pruning: reading one lang dir touches only that subtree
    assert spark.read.parquet(out).where(F.col("lang") == "en").count() == 67


def test_sink_shard_count_and_file_cap(spark, tmp_path):
    out = str(tmp_path / "sharded")
    ParquetSink(path=out, n_shards=3, max_records_per_file=40).write(
        _docs(spark, 150).drop("lang")
    )
    files = glob.glob(f"{out}/*.parquet")
    # 3 shards of ~50 rows, capped at 40 rows/file → >3 files, none over cap
    assert len(files) > 3
    for f in files:
        assert spark.read.parquet(f).count() <= 40
    assert spark.read.parquet(out).count() == 150


def test_range_sharding_orders_files(spark, tmp_path):
    out = str(tmp_path / "ranged")
    ParquetSink(
        path=out, n_shards=4, range_shard_by=("doc_id",),
        sort_within_by=("doc_id",),
    ).write(_docs(spark, 100).drop("lang"))
    back = spark.read.parquet(out)
    assert back.count() == 100
    # each physical file holds a contiguous doc_id range (range clustering)
    spans = []
    for f in glob.glob(f"{out}/*.parquet"):
        rows = spark.read.parquet(f).agg(
            F.min("doc_id"), F.max("doc_id"), F.count(F.lit(1))
        ).collect()[0]
        spans.append((rows[0], rows[1], rows[2]))
    spans.sort()
    for (_, hi_prev, _), (lo_next, _, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next


def test_kmv_estimate_close_to_exact(spark):
    df = spark.range(5000).select((F.col("id") % 1000).alias("v"))
    row = ops.approx_distinct_kmv(df, "v", k=256).collect()[0]
    assert row["k_used"] == 256
    assert abs(row["approx_distinct"] - 1000) / 1000 < 0.15


def test_kmv_small_domain_uses_k_used(spark):
    df = spark.range(1000).select((F.col("id") % 7).alias("v"))
    row = ops.approx_distinct_kmv(df, "v", k=256).collect()[0]
    assert row["k_used"] == 7  # exact distinct count, below k


def test_kmv_ignores_nulls(spark):
    # NULL used to hash to a NULL row that survived distinct() and,
    # sorting NULLS FIRST, stole a k-min slot — inflating k_used by 1
    # and breaking alignment with COUNT(DISTINCT ...) and with the
    # streaming twin (which skips NULLs)
    rows = [(None,)] * 5 + [(f"v{i}",) for i in range(9)]
    df = spark.createDataFrame(rows, "v string")
    row = ops.approx_distinct_kmv(df, "v", k=256).collect()[0]
    assert row["k_used"] == 9
    clean = ops.approx_distinct_kmv(
        df.where("v IS NOT NULL"), "v", k=256
    ).collect()[0]
    assert row == clean


def test_kmv_resemblance_ignores_nulls(spark):
    rows = [(None, 0)] * 3 + [(f"v{i}", i % 2) for i in range(10)]
    df = spark.createDataFrame(rows, "v string, side int")
    a, b = df.where("side = 0"), df.where("side = 1")
    got = ops.kmv_set_resemblance(a, b, "v", k=64).collect()[0]
    # sides are disjoint non-null sets of 5 each: union exact = 10
    assert got["k_used"] == 10 and got["n_both"] == 0


def test_sketch_comparison_shapes(spark):
    df = spark.range(2000).select((F.col("id") % 300).alias("v"))
    row = ops.distinct_sketch_comparison(df, "v", k=128).collect()[0]
    assert row["exact"] == 300
    assert abs(row["hll_estimate"] - 300) / 300 < 0.25
    assert abs(row["kmv_estimate"] - 300) / 300 < 0.25


def test_int8_quantization_preserves_topk_recall(spark):
    """Dequantized int8 cosine must keep >=90% recall@10 vs float top-k —
    the acceptance bar for shipping the 4x-compressed scale path."""
    from concept_multi_db_query_engine_spark import operators as ops
    from concept_multi_db_query_engine_spark import testdata
    from pyspark.sql import functions as F

    emb = testdata.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where("vec_id < 10")
    exact = ops.topk_cosine_bruteforce(emb, queries, k=10)
    deq = ops.quantize_embeddings_int8(emb).select(
        "vec_id",
        F.expr("transform(qvec, q -> q * scale)").alias("embedding"),
    )
    deq_queries = deq.where("vec_id < 10")
    approx = ops.topk_cosine_bruteforce(deq, deq_queries, k=10)
    exact_pairs = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    approx_pairs = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.9, recall


def test_ann_recall_at_k_bounds_and_monotonicity(spark):
    """recall in [0,1]; fewer LSH bits → bigger buckets → recall can only
    improve or stay equal on average (the calibration property the operator
    exists to measure)."""
    from concept_multi_db_query_engine_spark import operators as ops
    from concept_multi_db_query_engine_spark import testdata

    emb = testdata.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where("vec_id < 8")

    def mean_recall(bits):
        rows = ops.ann_recall_at_k(emb, queries, k=5, bits=bits).collect()
        assert rows, "no per-query rows"
        for r in rows:
            assert 0.0 <= r["recall"] <= 1.0
            assert r["n_hits"] <= r["n_exact"] <= 5
        return sum(r["recall"] for r in rows) / len(rows)

    assert mean_recall(2) >= mean_recall(4)


def test_blocked_cosine_no_duplicate_pairs_when_blocks_outnumber_vectors(
    spark,
):
    """Regression: with more blocks than vectors, off-diagonal block pairs
    whose partner block is empty must emit NOTHING — deriving diagonality
    from side-emptiness re-emitted within-block pairs once per empty
    partner block."""
    from concept_multi_db_query_engine_spark.operators import dedup

    rows = [(i, [float(i % 3 == 0), 1.0, 0.5]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = dedup.embedding_cosine_pairs(
        emb, threshold=0.5, n_blocks=16
    ).collect()
    pairs = [(r["v1"], r["v2"]) for r in out]
    assert len(pairs) == len(set(pairs)), "duplicate pairs emitted"
    # cross-check against the trivial all-pairs computation
    import itertools
    import math

    vecs = dict(rows)
    expected = set()
    for a, b in itertools.combinations(sorted(vecs), 2):
        va, vb = vecs[a], vecs[b]
        cos = round(
            sum(x * y for x, y in zip(va, vb))
            / math.sqrt(sum(x * x for x in va) * sum(y * y for y in vb)),
            4,
        )
        if cos >= 0.5:
            expected.add((a, b))
    assert set(pairs) == expected


def test_minhash_estimate_tracks_exact_jaccard(spark):
    """Signature-agreement estimate: exact duplicates score 1.0, and on a
    near-dup pair the 16-slot estimate lands within the standard-error band
    of the exact Jaccard (the property that lets the estimate replace the
    exact verify join at scale)."""
    from concept_multi_db_query_engine_spark import operators as ops

    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(55)) + " x1 x2 x3 x4 x5"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, near)], "doc_id long, text string")
    est = {(r["d1"], r["d2"]): r["est_jaccard"]
           for r in ops.minhash_estimate_pairs(
               docs, k=5, min_estimate=0.0).collect()}
    exact = {(r["d1"], r["d2"]): r["jaccard"]
             for r in ops.minhash_lsh_pairs(
                 docs, k=5, threshold=0.0).collect()}
    assert est[(1, 2)] == 1.0 and exact[(1, 2)] == 1.0
    # 16 hashes -> se ~ sqrt(j(1-j)/16) ~ 0.12; allow 3 se
    assert abs(est[(1, 3)] - exact[(1, 3)]) < 0.36
