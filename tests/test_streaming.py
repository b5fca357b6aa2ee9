"""Structured Streaming operators: every streaming plan is checked against
its BATCH TWIN over the same bounded events parquet — Spark's unified
semantics make the batch result the oracle (no hand-computed fixtures).

sf0.001 keeps the file-source micro-batching fast; processAllAvailable
drains the bounded stream to a memory sink.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concept_multi_db_query_engine_spark import testdata
from concept_multi_db_query_engine_spark.streaming import windows as sw

SF_DIR = "/root/testdata/sf0.001"
EVENTS = f"{SF_DIR}/events.parquet"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_window_stream_matches_batch(spark):
    got = sw.run_windowed_aggregation_batch(spark, EVENTS)
    batch = sw.windowed_event_counts(
        testdata.load_table(spark, SF_DIR, "events")
    )
    cols = ["window_start", "window_end", "event_type", "n_events",
            "sum_value"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert len(got.collect()) > 0


def test_session_window_stream_matches_batch(spark):
    stream_plan = sw.session_window_counts(
        sw._bounded_event_stream(spark, EVENTS)
    )
    sw.run_stream_to_memory(stream_plan, "session_counts")
    got = spark.sql("SELECT * FROM session_counts")
    batch = sw.session_window_counts(
        testdata.load_table(spark, SF_DIR, "events")
    )
    cols = ["session_start", "session_end", "user_id", "n_events",
            "sum_value"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert len(got.collect()) > 0


def test_session_window_agrees_with_batch_sessionize(spark):
    """The native session_window and the explicit lag/cumsum sessionize must
    find the same session boundaries (same 30-min gap rule)."""
    from concept_multi_db_query_engine_spark import operators as ops

    events = testdata.load_table(spark, SF_DIR, "events")
    a = sw.session_window_counts(events, gap="30 minutes")
    b = ops.sessionize(events, gap_minutes=30)
    rows_a = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in a.collect()
    )
    rows_b = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in b.collect()
    )
    assert rows_a == rows_b


def test_stateful_running_totals(spark):
    """applyInPandasWithState keeps per-user accumulators; after draining the
    bounded stream the final state per user must equal the batch groupBy."""
    stream_plan = sw.running_user_totals(
        sw._bounded_event_stream(spark, EVENTS)
    )
    sw.run_stream_to_memory(
        stream_plan, "running_totals", output_mode="update"
    )
    got = spark.sql(
        # the memory sink in update mode appends one row per user per
        # micro-batch; the final row per user carries the final totals
        """
        SELECT user_id, n_events, sum_value FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY n_events DESC) AS rn
          FROM running_totals
        ) WHERE rn = 1
        """
    )
    batch = (
        testdata.load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    cols = ["user_id", "n_events"]
    assert _rows(got, cols) == _rows(batch, cols)
    # sums agree to rounding (state accumulates in float64 sequentially)
    got_sums = {r["user_id"]: r["sum_value"] for r in got.collect()}
    for r in batch.collect():
        assert got_sums[r["user_id"]] == pytest.approx(
            r["sum_value"], abs=1e-3
        )


def test_stream_dedup_matches_batch_distinct(spark):
    """Streaming dropDuplicatesWithinWatermark keeps exactly one row per
    (user_id, event_type): the emitted KEY SET must equal batch DISTINCT
    (which row survives is arrival-order-dependent, so keys — not payloads —
    are the deterministic contract)."""
    from concept_multi_db_query_engine_spark.streaming.windows import (
        run_stream_dedup_batch,
    )
    from concept_multi_db_query_engine_spark import testdata

    path = "/root/testdata/sf0.001/events.parquet"
    out = run_stream_dedup_batch(spark, path)
    stream_keys = {(r["user_id"], r["event_type"]) for r in out.collect()}
    assert len(stream_keys) == out.count()  # exactly one row per key
    batch = testdata.load_table(spark, "/root/testdata/sf0.001", "events")
    batch_keys = {
        (r["user_id"], r["event_type"])
        for r in batch.select("user_id", "event_type").distinct().collect()
    }
    assert stream_keys == batch_keys


def test_clean_documents_stream_matches_batch(spark):
    """Streaming corpus ingestion (quality gate + fingerprint dedup) must
    keep exactly the batch pipeline's fingerprint set — same quality gate,
    same keep-one-per-fingerprint policy."""
    from concept_multi_db_query_engine_spark.operators.text import (
        _quality_exprs,
    )
    from concept_multi_db_query_engine_spark.streaming import corpus as sc

    docs_path = f"{SF_DIR}/documents.parquet"
    got = sc.run_clean_documents_batch(spark, docs_path)
    rows = got.collect()
    assert rows, "stream produced no rows"
    # streaming side emits one row per unique fingerprint
    fps = [r["fingerprint"] for r in rows]
    assert len(fps) == len(set(fps))
    # batch twin: same gate, same dedup key
    _, _, score = _quality_exprs()
    batch = (
        testdata.load_table(spark, SF_DIR, "documents")
        .withColumn("quality", score.cast("double"))
        .where(F.col("quality") >= 0.3)
        .select(F.md5("text").alias("fingerprint"))
        .distinct()
    )
    assert set(fps) == {r["fingerprint"] for r in batch.collect()}
    # at sf0.001 every synthetic doc clears the 0.3 gate with no exact
    # dupes, so the stream passes all rows through — a strict gate must
    # actually filter (non-vacuity of the quality expression)
    strict = sc.run_clean_documents_batch(
        spark, docs_path, min_quality=0.9
    ).collect()
    assert len(strict) < len(fps)


def test_hash_split_runs_unchanged_on_a_stream(spark):
    """hash_split is a stateless narrow map (md5 threshold on the id), so
    the SAME operator code must be a valid streaming plan and assign the
    SAME splits as batch — the property that lets an ingestion stream
    route documents to train/val/test shards on the fly."""
    from concept_multi_db_query_engine_spark import operators as ops

    import os
    import tempfile

    docs_path = f"{SF_DIR}/documents.parquet"
    batch_docs = spark.read.parquet(docs_path)
    # the file stream source requires a directory
    d = tempfile.mkdtemp(prefix="stream-docs-")
    os.symlink(docs_path, os.path.join(d, "documents.parquet"))
    stream_docs = spark.readStream.schema(batch_docs.schema).parquet(d)
    sw.run_stream_to_memory(
        ops.hash_split(stream_docs), "stream_hash_split",
        output_mode="append",
    )
    got = {
        (r["doc_id"], r["split"])
        for r in spark.sql("SELECT * FROM stream_hash_split").collect()
    }
    want = {
        (r["doc_id"], r["split"])
        for r in ops.hash_split(batch_docs).collect()
    }
    assert got == want and len(got) > 0


def test_windowed_active_users_stream_matches_batch_exactly(spark):
    """HLL++ register merges are commutative/idempotent, so the streaming
    approx-distinct equals the batch approx-distinct bit-for-bit — no
    tolerance in this assertion is intentional."""
    stream = sw._bounded_event_stream(spark, EVENTS)
    sw.run_stream_to_memory(
        sw.windowed_active_users(stream), "windowed_active_users"
    )
    got = spark.sql("SELECT * FROM windowed_active_users")
    batch = sw.windowed_active_users(
        testdata.load_table(spark, SF_DIR, "events")
    )
    cols = ["window_start", "event_type", "approx_users", "n_events"]
    assert _rows(got, cols) == _rows(batch, cols)
    # sanity: the estimate tracks the exact count at 1% rsd on small data
    exact = (
        testdata.load_table(spark, SF_DIR, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.countDistinct("user_id").alias("x"))
        .agg(F.sum("x")).collect()[0][0]
    )
    approx_total = got.agg(F.sum("approx_users")).collect()[0][0]
    assert abs(approx_total - exact) / exact < 0.05


def test_sliding_active_users_stream_matches_batch(spark):
    stream = sw._bounded_event_stream(spark, EVENTS)
    sw.run_stream_to_memory(
        sw.sliding_active_users(stream), "sliding_active_users"
    )
    got = spark.sql("SELECT * FROM sliding_active_users")
    batch = sw.sliding_active_users(
        testdata.load_table(spark, SF_DIR, "events")
    )
    cols = ["window_start", "window_end", "approx_users"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert got.count() > 1


def test_stream_static_enrichment_matches_batch(spark):
    dims = spark.range(0, 2000).selectExpr(
        "id AS user_id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS segment"
    )
    stream = sw._bounded_event_stream(spark, EVENTS)
    sw.run_stream_to_memory(
        sw.enrich_stream(stream, dims), "enriched_events",
        output_mode="append",
    )
    got = spark.sql("SELECT * FROM enriched_events")
    batch = sw.enrich_stream(
        testdata.load_table(spark, SF_DIR, "events"), dims
    )
    cols = ["event_id", "user_id", "event_type", "segment"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert got.count() > 0


def test_stream_stream_interval_join_matches_batch(spark):
    ev = testdata.load_table(spark, SF_DIR, "events")
    p_stream = sw._bounded_event_stream(spark, EVENTS).where(
        "event_type = 'purchase'"
    )
    c_stream = sw._bounded_event_stream(spark, EVENTS).where(
        "event_type = 'click'"
    )
    sw.run_stream_to_memory(
        sw.purchase_click_pairs(p_stream, c_stream),
        "purchase_click_pairs", output_mode="append",
    )
    got = spark.sql("SELECT * FROM purchase_click_pairs")
    batch = sw.purchase_click_pairs(
        ev.where("event_type = 'purchase'"), ev.where("event_type = 'click'")
    )
    cols = ["purchase_id", "click_id", "user_id"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert got.count() > 0


def test_kmeans_encode_stream_matches_batch(spark):
    """Codebook inference on a stream: kmeans_fit trains the frozen
    (cid, cq) model on the batch corpus; kmeans_encode is a stateless
    narrow map (quantize + broadcast stream-static join + per-row
    argmin), so the SAME operator code encodes the bounded embedding
    stream to the exact batch assignment — the train-nightly /
    encode-on-arrival layout."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    emb_path = f"{SF_DIR}/embeddings.parquet"
    batch_emb = spark.read.parquet(emb_path)
    model = ops.kmeans_fit(batch_emb, k=4, iterations=2)
    d = tempfile.mkdtemp(prefix="stream-emb-")
    os.symlink(emb_path, os.path.join(d, "embeddings.parquet"))
    stream_emb = spark.readStream.schema(batch_emb.schema).parquet(d)
    sw.run_stream_to_memory(
        ops.kmeans_encode(stream_emb, model), "stream_kmeans_encode",
        output_mode="append",
    )
    got = {
        (r["vec_id"], r["cluster"], r["dist2_scaled"])
        for r in spark.sql("SELECT * FROM stream_kmeans_encode").collect()
    }
    want = {
        (r["vec_id"], r["cluster"], r["dist2_scaled"])
        for r in ops.kmeans_encode(batch_emb, model).collect()
    }
    assert got == want and len(got) > 0


def test_char_entropy_runs_unchanged_on_a_stream(spark):
    """char_entropy is a stateless narrow map (sorted run-length fold per
    row), so the SAME operator code is a valid append-mode streaming plan
    with batch-identical output — quality scoring at ingestion time."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    docs_path = f"{SF_DIR}/documents.parquet"
    batch_docs = spark.read.parquet(docs_path)
    d = tempfile.mkdtemp(prefix="stream-entropy-")
    os.symlink(docs_path, os.path.join(d, "documents.parquet"))
    stream_docs = spark.readStream.schema(batch_docs.schema).parquet(d)
    sw.run_stream_to_memory(
        ops.char_entropy(stream_docs), "stream_char_entropy",
        output_mode="append",
    )
    got = {
        (r["doc_id"], r["entropy"])
        for r in spark.sql("SELECT * FROM stream_char_entropy").collect()
    }
    want = {
        (r["doc_id"], r["entropy"])
        for r in ops.char_entropy(batch_docs).collect()
    }
    assert got == want and len(got) > 0


def test_unigram_scoring_runs_unchanged_on_a_stream(spark):
    """The unigram LM trains on the batch corpus (driver-side model
    collect) and scoring is a stateless narrow map over a broadcast map
    literal — so the SAME operator scores the bounded document stream to
    the exact batch bits/token. The perplexity-filter-at-ingestion
    layout."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    docs_path = f"{SF_DIR}/documents.parquet"
    batch_docs = spark.read.parquet(docs_path)
    d = tempfile.mkdtemp(prefix="stream-unigram-")
    os.symlink(docs_path, os.path.join(d, "documents.parquet"))
    stream_docs = spark.readStream.schema(batch_docs.schema).parquet(d)
    sw.run_stream_to_memory(
        ops.unigram_logprob_score(
            stream_docs, corpus=batch_docs, top_n=100
        ),
        "stream_unigram", output_mode="append",
    )
    got = {
        (r["doc_id"], r["bits_per_token"])
        for r in spark.sql("SELECT * FROM stream_unigram").collect()
    }
    want = {
        (r["doc_id"], r["bits_per_token"])
        for r in ops.unigram_logprob_score(
            batch_docs, corpus=batch_docs, top_n=100
        ).collect()
    }
    assert got == want and len(got) > 0


def test_psi_drift_monitoring_via_foreach_batch(spark):
    """Drift monitoring at ingestion: PSI needs a sorted-bin fold over a
    completed aggregate, which append-mode streaming can't express
    directly — the production pattern is foreachBatch, scoring each
    micro-batch against the static baseline with the BATCH operator.
    A micro-batch identical to the baseline must score exactly 0."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    orders_path = "/root/testdata/sf0.001/orders.parquet"
    baseline = spark.read.parquet(orders_path)
    d = tempfile.mkdtemp(prefix="stream-psi-")
    os.symlink(orders_path, os.path.join(d, "orders.parquet"))
    stream = spark.readStream.schema(baseline.schema).parquet(d)
    scores: list = []

    def check(batch_df, _batch_id):
        if batch_df.isEmpty():
            return
        r = ops.psi_drift(
            baseline, batch_df, "o_totalprice", bin_width=10000.0
        ).collect()[0]
        scores.append((r["psi"], r["n_b"]))

    q = (
        stream.writeStream.foreachBatch(check)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert scores, "no micro-batch was scored"
    total_rows = baseline.count()
    assert sum(n for _, n in scores) == total_rows
    # the bounded stream replays the baseline exactly -> every batch of
    # it is a subsample; the full-coverage case scores identically zero
    if len(scores) == 1:
        assert scores[0][0] == 0.0


def test_count_min_sketch_merges_across_micro_batches(spark):
    """CMS counters are plain sums, so per-micro-batch sketches merged
    counter-wise on (j, bucket) must equal the batch sketch over the
    whole stream — the mergeability that makes count-min the streaming /
    incremental frequency summary (foreachBatch accumulates the running
    sketch exactly as a multi-day ingestion job would)."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    events_path = "/root/testdata/sf0.001/events.parquet"
    batch = spark.read.parquet(events_path)
    d = tempfile.mkdtemp(prefix="stream-cms-")
    os.symlink(events_path, os.path.join(d, "events.parquet"))
    stream = spark.readStream.schema(batch.schema).parquet(d)
    merged: dict = {}

    def absorb(batch_df, _batch_id):
        if batch_df.isEmpty():
            return
        for r in ops.count_min_sketch(
                batch_df, "user_id", depth=4, width=64).collect():
            key = (r["j"], r["bucket"])
            merged[key] = merged.get(key, 0) + r["c"]

    q = (
        stream.writeStream.foreachBatch(absorb)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = {
        (r["j"], r["bucket"]): r["c"]
        for r in ops.count_min_sketch(
            batch, "user_id", depth=4, width=64).collect()
    }
    assert merged == want
    assert sum(merged.values()) == 4 * batch.count()


def test_importance_weights_score_stream_against_frozen_models(spark):
    """DSIR scoring at ingestion: both unigram models (target + source)
    freeze on batch frames, and the narrow scoring map runs unchanged on
    a stream — every micro-batch row scores to the exact batch value."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    batch = spark.read.parquet(docs_path)
    target = batch.where("lang = 'en'")
    want = {
        r["doc_id"]: (r["n_tokens"], r["avg_log_ratio"])
        for r in ops.importance_weights(
            batch, target, top_n=50, source=batch).collect()
    }
    d = tempfile.mkdtemp(prefix="stream-dsir-")
    os.symlink(docs_path, os.path.join(d, "documents.parquet"))
    stream = spark.readStream.schema(batch.schema).parquet(d)
    scored = ops.importance_weights(stream, target, top_n=50, source=batch)
    q = (
        scored.writeStream.format("memory").queryName("dsir_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_log_ratio"])
        for r in spark.sql("SELECT * FROM dsir_stream").collect()
    }
    assert got == want


def test_url_canonicalization_dedup_on_a_stream(spark):
    """URL dedup at ingestion: the canonicalization Column is a pure
    narrow map, so it runs on a stream as-is and
    dropDuplicatesWithinWatermark on the canonical key keeps exactly
    one row per page — the batch operator's group count agrees."""
    import datetime as dt
    import os
    import shutil
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops
    from pyspark.sql import functions as SF

    rows = [
        (1, "https://www.Example.com/A", dt.datetime(2024, 1, 1, 0, 0)),
        (2, "http://example.com/a/", dt.datetime(2024, 1, 1, 0, 1)),
        (3, "example.com/a?utm=x", dt.datetime(2024, 1, 1, 0, 2)),
        (4, "https://other.org/b#f", dt.datetime(2024, 1, 1, 0, 3)),
    ]
    batch = spark.createDataFrame(
        rows, "doc_id long, url string, ts timestamp"
    )
    d = tempfile.mkdtemp(prefix="stream-url-")
    batch.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "in"))
    stream = spark.readStream.schema(batch.schema).parquet(
        os.path.join(d, "in"))
    deduped = (
        stream.withColumn("canonical_url", ops.canonicalize_url("url"))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["canonical_url"])
    )
    q = (
        deduped.writeStream.format("memory").queryName("url_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT canonical_url FROM url_stream").collect()
    keys = sorted(r["canonical_url"] for r in got)
    assert keys == ["example.com/a", "other.org/b"]
    n_batch = ops.url_normalize_dedup(batch, "url").count()
    assert len(keys) == n_batch
    shutil.rmtree(d, ignore_errors=True)


def test_incremental_state_merge_across_micro_batches(spark):
    """The algebraic (cnt, decimal sum, min, max) state folds every
    micro-batch into the running state via incremental_state_merge;
    because each statistic is associative and the sum exact decimal,
    the final state must equal the one-shot batch reduce — the
    foreachBatch shape of a continuously-maintained rollup."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    orders_path = "/root/testdata/sf0.001/orders.parquet"
    batch = spark.read.parquet(orders_path)
    d = tempfile.mkdtemp(prefix="stream-state-")
    os.symlink(orders_path, os.path.join(d, "orders.parquet"))
    stream = spark.readStream.schema(batch.schema).parquet(d)
    holder = {"state": None}

    def absorb(batch_df, _batch_id):
        if batch_df.isEmpty():
            return
        if holder["state"] is None:
            nxt = ops.reduce_to_state(
                batch_df, "o_orderpriority", "o_totalprice")
        else:
            prev = spark.createDataFrame(
                holder["state"], schema=holder["schema"])
            nxt = ops.incremental_state_merge(
                prev, batch_df, "o_orderpriority", "o_totalprice")
        holder["schema"] = nxt.schema
        holder["state"] = nxt.collect()

    q = (
        stream.writeStream.foreachBatch(absorb)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, holder["state"]))
    want = sorted(map(tuple, ops.reduce_to_state(
        batch, "o_orderpriority", "o_totalprice").collect()))
    assert got == want


def test_bloom_prefilter_runs_unchanged_on_a_stream(spark):
    """The packed Bloom filter is frozen model data and the probe a
    narrow map, so bloom_prefilter applies to a readStream side
    unchanged — the stream-static shape of runtime-filter ingestion
    (drop non-matching rows at the door)."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    orders_path = "/root/testdata/sf0.001/orders.parquet"
    batch = spark.read.parquet(orders_path)
    dim = spark.read.parquet(
        "/root/testdata/sf0.001/customer.parquet"
    ).where("c_mktsegment = 'BUILDING'")
    want = {r["o_orderkey"] for r in ops.bloom_prefilter(
        batch, dim, "o_custkey", "c_custkey", n_bits=4096).collect()}
    d = tempfile.mkdtemp(prefix="stream-bloom-")
    os.symlink(orders_path, os.path.join(d, "orders.parquet"))
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        ops.bloom_prefilter(stream, dim, "o_custkey", "c_custkey",
                            n_bits=4096)
        .writeStream.format("memory").queryName("bloom_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["o_orderkey"]
           for r in spark.sql("SELECT * FROM bloom_stream").collect()}
    assert got == want


def test_minhash_incremental_probe_on_streamed_batches(spark):
    """Fuzzy ingestion dedup as a stream: each micro-batch probes the
    frozen corpus LSH index via foreachBatch, and the union of
    per-batch matches equals the one-shot batch probe — per-batch cost
    scales with the batch, corpus state is static."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(docs_path)
    corpus = docs.where("doc_id % 4 != 0")
    batch_side = docs.where("doc_id % 4 = 0")
    want = sorted(
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in ops.minhash_incremental_pairs(
            corpus, batch_side, k=5, num_hashes=16, bands=4,
            threshold=0.5).collect())
    d = tempfile.mkdtemp(prefix="stream-mh-")
    os.symlink(docs_path, os.path.join(d, "documents.parquet"))
    stream = spark.readStream.schema(docs.schema).parquet(d)
    got: list = []

    def probe(batch_df, _batch_id):
        new = batch_df.where("doc_id % 4 = 0")
        if new.isEmpty():
            return
        got.extend(
            (r["new_id"], r["corpus_id"], r["jaccard"])
            for r in ops.minhash_incremental_pairs(
                corpus, new, k=5, num_hashes=16, bands=4,
                threshold=0.5).collect())

    q = (
        stream.writeStream.foreachBatch(probe)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert sorted(got) == want


def test_stream_classifier_scoring_matches_batch(spark):
    """logistic_score is a frozen-weights narrow map: scoring a bounded
    document stream must produce exactly the batch scores."""
    from concept_multi_db_query_engine_spark.operators.classify import (
        logistic_score,
    )
    from concept_multi_db_query_engine_spark.streaming import corpus as sc

    docs_path = f"{SF_DIR}/documents.parquet"
    feats = [
        "(CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)"
        " / CAST(length(text) AS DOUBLE))",
    ]
    w = [0.2, -1.5]
    stream = sc._bounded_document_stream(spark, docs_path)
    plan = sc.score_document_stream(stream, w, feats)
    sc.run_clean_documents_batch  # module import sanity
    from concept_multi_db_query_engine_spark.streaming.windows import (
        run_stream_to_memory,
    )

    run_stream_to_memory(plan, "stream_scored", output_mode="append")
    got = _rows(spark.sql("SELECT * FROM stream_scored"),
                ["doc_id", "score", "predicted"])
    batch = logistic_score(
        testdata.load_table(spark, SF_DIR, "documents"), w, feats)
    assert got == _rows(batch, ["doc_id", "score", "predicted"])


def test_stream_quota_admission_caps_every_domain(spark):
    """applyInPandasWithState quota: across the whole drained stream no
    domain exceeds its cap, ranks are 1..n_kept, and under-quota domains
    keep everything."""
    from concept_multi_db_query_engine_spark.streaming import corpus as sc

    docs_path = f"{SF_DIR}/documents.parquet"
    stream = sc._bounded_document_stream(spark, docs_path)
    plan = sc.quota_admission_stream(stream, quota=7)
    from concept_multi_db_query_engine_spark.streaming.windows import (
        run_stream_to_memory,
    )

    run_stream_to_memory(plan, "stream_quota", output_mode="append")
    got = spark.sql("SELECT * FROM stream_quota").collect()
    per = {}
    for r in got:
        per.setdefault(r["source"], []).append(r["admit_rank"])
    totals = {
        r["source"]: r["n"]
        for r in testdata.load_table(spark, SF_DIR, "documents")
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for dom, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) == min(7, totals[dom])
    assert set(per) == set(totals)


def test_incremental_span_cleaning_via_foreach_batch(spark):
    """Streaming corpus ingestion with span hygiene: each arriving
    micro-batch is cleaned against the frozen corpus' dup-gram index
    with the BATCH operator inside foreachBatch (within-batch dup
    detection needs the completed micro-batch, which append mode can't
    express) — the drained result must equal one batch pass."""
    from concept_multi_db_query_engine_spark import operators as ops
    from concept_multi_db_query_engine_spark.streaming import corpus as sc

    docs_path = f"{SF_DIR}/documents.parquet"
    corpus = testdata.load_table(spark, SF_DIR, "documents") \
        .where("doc_id % 2 = 0")
    arriving = testdata.load_table(spark, SF_DIR, "documents") \
        .where("doc_id % 2 = 1")
    stream = sc._bounded_document_stream(spark, docs_path)
    cleaned: list = []

    def clean(batch_df, _batch_id):
        if batch_df.isEmpty():
            return
        part = batch_df.where("doc_id % 2 = 1")
        if part.isEmpty():
            return
        cleaned.extend(
            map(tuple, ops.dedup_span_removal_incremental(
                part, corpus, n=8).collect()))

    q = (
        stream.writeStream.foreachBatch(clean)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch_result = sorted(map(tuple, ops.dedup_span_removal_incremental(
        arriving, corpus, n=8).collect()))
    # the bounded file source delivers everything in one micro-batch
    # here; with many micro-batches, within-batch dups would split —
    # the corpus-side cleaning (the contract) is identical either way
    assert sorted(cleaned) == batch_result


def test_incremental_skyline_across_micro_batches(spark):
    """Pareto-frontier maintenance: skyline(S ∪ B) ==
    skyline(skyline(S) ∪ B), so the foreachBatch state is only the
    CURRENT FRONTIER (bounded model data, never the corpus) — each
    micro-batch unions into the frontier and re-runs the bucketed
    skyline. The final frontier must equal the one-shot batch skyline.
    Batches are fed manually (deterministic 3-way split by id) so the
    identity is exercised across real state hand-offs."""
    from concept_multi_db_query_engine_spark import operators as ops

    x = 424242
    pts = []
    for i in range(300):
        x = (x * 1103515245 + 12345) % (2**31)
        a = x % 400
        x = (x * 1103515245 + 12345) % (2**31)
        pts.append((i, a, x % 400))
    full = spark.createDataFrame(pts, "id long, a long, b long")
    want = sorted(map(tuple, ops.skyline_2d(
        full, "a", "b", "id", bucket_width=16).collect()))

    frontier = None
    for k in range(3):
        batch = spark.createDataFrame(
            [p for p in pts if p[0] % 3 == k], "id long, a long, b long")
        merged = batch if frontier is None \
            else frontier.unionByName(batch)
        frontier = spark.createDataFrame(
            ops.skyline_2d(merged, "a", "b", "id",
                           bucket_width=16).collect(),
            "id long, a long, b long")
    assert sorted(map(tuple, frontier.collect())) == want


def test_incremental_benford_digit_state(spark):
    """Benford monitoring over a stream: the per-digit counts are the
    ONLY state (9 longs — algebraically mergeable across micro-batches
    by addition), and the report math is a pure function of the merged
    counts. Feeding three disjoint batches and merging their digit
    counts must reproduce the one-shot batch report exactly."""
    import math
    from concept_multi_db_query_engine_spark import operators as ops

    vals = [round(1.01 * (1.37 ** i) % 997, 2) for i in range(120)]
    full = spark.createDataFrame([(v,) for v in vals], "amount double")
    want = {r["digit"]: (r["n_obs"], r["chi2_micro"])
            for r in ops.benford_report(full, "amount").collect()}

    state = {d: 0 for d in range(1, 10)}
    for k in range(3):
        batch = spark.createDataFrame(
            [(v,) for i, v in enumerate(vals) if i % 3 == k],
            "amount double")
        for r in ops.benford_report(batch, "amount").collect():
            state[r["digit"]] += r["n_obs"]
    assert {d: state[d] for d in state} == {
        d: want[d][0] for d in want}

    def micro(v):
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    n = sum(state.values())
    exp = {d: micro(math.log(1.0 + 1.0 / d) / math.log(10.0) * 1e6)
           for d in range(1, 10)}
    chi2 = sum(micro((state[d] - n * (exp[d] / 1e6)) ** 2
                     / (n * (exp[d] / 1e6)) * 1e6) for d in range(1, 10))
    assert all(want[d][1] == chi2 for d in want)


def test_incremental_scd2_via_open_interval_state(spark):
    """SCD2 maintenance on a stream: the state is ONLY each key's OPEN
    interval (the current row — bounded by key cardinality, never the
    history). Per micro-batch, re-running scd2_history over (open
    state ∪ batch) closes whatever the new changes supersede; closed
    intervals are append-only. CONTRACT: per-key ordered delivery (the
    Kafka key-partitioning guarantee) — a late change older than an
    already-closed interval would require splitting it, i.e. key-level
    reprocessing, not this state. Batches below therefore split each
    key's change sequence by per-key ORDER while keys span all batches
    (every batch closes intervals opened by earlier ones). The
    accumulated table must equal the one-shot batch scd2_history on
    interval content (versions renumber at read time)."""
    import datetime as dt
    from concept_multi_db_query_engine_spark import operators as ops

    t = lambda d: dt.datetime(2024, 1, d)
    rows = [(i, 10 + (i % 3) * 10, t(1 + (i * 7) % 27),
             "s%d" % (i % 5), float(i)) for i in range(30)]
    schema = ("event_id long, user_id long, ts timestamp, "
              "event_type string, value double")
    # per-key ordered delivery: the k-th third of EACH key's
    # ts-ordered changes arrives in batch k
    seq_in_key = {}
    for r in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        seq_in_key[r[0]] = sum(1 for q in rows if q[1] == r[1]
                               and (q[2], q[0]) < (r[2], r[0]))
    n_per_key = {u: sum(1 for q in rows if q[1] == u)
                 for u in {r[1] for r in rows}}
    batch_of = {i: min(2, 3 * seq_in_key[i] // n_per_key[r1])
                for i, r1 in ((r[0], r[1]) for r in rows)}
    full = spark.createDataFrame(rows, schema)
    want = sorted(
        (r["user_id"], r["event_type"], r["value"], r["valid_from"],
         r["valid_to"], r["is_current"])
        for r in ops.scd2_history(full, ["user_id"], "ts", "event_id",
                                  ["event_type", "value"]).collect())

    closed, open_rows = [], []
    for k in range(3):
        batch = [r for r in rows if batch_of[r[0]] == k]
        merged = spark.createDataFrame(
            open_rows + batch, schema)
        hist = ops.scd2_history(merged, ["user_id"], "ts", "event_id",
                                ["event_type", "value"]).collect()
        closed += [r for r in hist if not r["is_current"]]
        # reopen: current rows go back into state AS CHANGE ROWS —
        # event_id is carried inside valid_from ordering only, so
        # resynthesize a stable tiebreaker from the original batch
        open_keys = {(r["user_id"], r["valid_from"], r["event_type"],
                      r["value"]) for r in hist if r["is_current"]}
        open_rows = [r for r in (open_rows + batch)
                     if (r[1], r[2], r[3], r[4]) in open_keys]
    final = closed + [r for r in ops.scd2_history(
        spark.createDataFrame(open_rows, schema),
        ["user_id"], "ts", "event_id",
        ["event_type", "value"]).collect()]
    got = sorted(
        (r["user_id"], r["event_type"], r["value"], r["valid_from"],
         r["valid_to"], r["is_current"]) for r in final)
    assert got == want


def test_incremental_diversity_via_count_state(spark):
    """Corpus-mix monitoring on a stream: the ONLY state is the
    (group, category) count frame — mergeable by addition — and the
    diversity report is a pure function of the merged counts, so
    feeding disjoint micro-batches and summing their count frames
    reproduces the one-shot report exactly (entropy, effective
    categories, and the unbiased Simpson all recompute from counts)."""
    from concept_multi_db_query_engine_spark import operators as ops

    rows = [(i, "s%d" % (i % 3), "l%d" % ((i * 7) % 4))
            for i in range(90)]
    full = spark.createDataFrame(rows, "doc_id int, source string, "
                                       "lang string")
    want = sorted(map(tuple, ops.diversity_report(
        full, "source", "lang").collect()))

    state = {}
    for k in range(3):
        batch = [r for r in rows if r[0] % 3 == k]
        bdf = spark.createDataFrame(batch, "doc_id int, source string, "
                                           "lang string")
        for r in bdf.groupBy("source", "lang").count().collect():
            key = (r["source"], r["lang"])
            state[key] = state.get(key, 0) + r["count"]
    # replay the report over a frame REBUILT from the merged counts
    rebuilt = spark.createDataFrame(
        [(g, c) for (g, c), n in state.items() for _ in range(n)],
        "source string, lang string")
    got = sorted(map(tuple, ops.diversity_report(
        rebuilt, "source", "lang").collect()))
    assert got == want


def test_incremental_growth_accounting_via_cell_state(spark):
    """Growth accounting on a stream: state is the DISTINCT (user,
    period) cell set — union of batches then distinct is the same set,
    so the report is a pure function of merged state. Three disjoint
    batches reproduce the one-shot report exactly."""
    import datetime as dt
    from concept_multi_db_query_engine_spark import operators as ops

    w = lambda n, d=0: dt.datetime(2024, 1, 1 + 7 * (n - 1) + d)
    rows = [(u, w(1 + ((u * 3 + k) % 4), (u + k) % 5))
            for u in range(20) for k in range(3)]
    full = spark.createDataFrame(rows, "user_id long, ts timestamp")
    want = sorted(map(tuple, ops.growth_accounting(
        full, period="week").collect()))

    cells = set()
    for k in range(3):
        batch = spark.createDataFrame(
            [r for i, r in enumerate(rows) if i % 3 == k],
            "user_id long, ts timestamp")
        for r in batch.selectExpr(
                "user_id", "date_trunc('week', CAST(ts AS DATE)) AS p"
        ).distinct().collect():
            cells.add((r["user_id"], r["p"]))
    rebuilt = spark.createDataFrame(
        [(u, p) for u, p in cells], "user_id long, ts timestamp")
    got = sorted(map(tuple, ops.growth_accounting(
        rebuilt, period="week").collect()))
    assert got == want


def test_incremental_trending_via_count_state(spark):
    """Trending monitoring on a stream: state is the per-key
    (n_before, n_after) count pair — mergeable by addition — and the
    smoothed share-lift report is a pure function of the merged
    counts. Three disjoint batches reproduce the one-shot report."""
    from concept_multi_db_query_engine_spark import operators as ops

    rows = [("k%d" % ((i * 7) % 6), 1 if i % 2 else 0)
            for i in range(120)]
    full = spark.createDataFrame(rows, "k string, post int")
    want = sorted(map(tuple, ops.trending_report(
        full, "k", "post = 1", pseudo=6, k=3).collect()))

    state = {}
    for b in range(3):
        batch = spark.createDataFrame(
            [r for i, r in enumerate(rows) if i % 3 == b],
            "k string, post int")
        for r in batch.groupBy("k", "post").count().collect():
            key = (r["k"], r["post"])
            state[key] = state.get(key, 0) + r["count"]
    rebuilt = spark.createDataFrame(
        [(k, p) for (k, p), n in state.items() for _ in range(n)],
        "k string, post int")
    got = sorted(map(tuple, ops.trending_report(
        rebuilt, "k", "post = 1", pseudo=6, k=3).collect()))
    assert got == want


def test_page_hinkley_stream_matches_batch_across_micro_batches(spark):
    """The streaming PH twin's O(1) per-key state replayed over TWO
    ordered micro-batches must land exactly on the batch operator's
    one-shot statistic (same micro quantization, same earliest-index
    peak tie-break)."""
    import os
    import tempfile
    import time as _time

    from concept_multi_db_query_engine_spark import operators as ops

    daily = (
        testdata.load_table(spark, SF_DIR, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("series_key"),
            F.expr("datediff(CAST(o_orderdate AS DATE), "
                   "DATE '1992-01-01')").cast("long").alias("idx"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
        .localCheckpoint(eager=True)
    )
    cut = 1200
    d = tempfile.mkdtemp(prefix="stream-ph-")
    early, late = os.path.join(d, "a"), os.path.join(d, "b")
    daily.where(F.col("idx") < cut).coalesce(1) \
        .write.parquet(early)
    daily.where(F.col("idx") >= cut).coalesce(1) \
        .write.parquet(late)
    # the file source orders batches by modification time: make the
    # early-idx file strictly older so event order holds across batches
    now = _time.time()
    for root, base in ((early, now - 120), (late, now)):
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (base, base))
    src = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.page_hinkley_stream(src)
    sw.run_stream_to_memory(plan, "ph_stream", output_mode="update")
    got = {
        r["series_key"]: (r["n_periods"], r["ph_micro"], r["peak_idx"])
        for r in spark.sql(
            """
            SELECT series_key, n_periods, ph_micro, peak_idx FROM (
              SELECT *, row_number() OVER (
                PARTITION BY series_key ORDER BY n_periods DESC) AS rn
              FROM ph_stream
            ) WHERE rn = 1
            """
        ).collect()
    }
    for key in got:
        want = ops.page_hinkley(
            daily.where(F.col("series_key") == key), "idx", "x"
        ).collect()[0]
        assert got[key] == (
            want["n_periods"], want["ph_micro"], want["peak_idx"]
        ), key


def test_sprt_stream_matches_batch_across_micro_batches(spark):
    """Wald-SPRT streaming twin: the per-key cumulative LLR, decision,
    and earliest crossing replayed over two ordered micro-batches must
    equal the batch operator on the same per-key series."""
    import os
    import tempfile
    import time as _time

    from concept_multi_db_query_engine_spark import operators as ops

    daily = (
        testdata.load_table(spark, SF_DIR, "events")
        .groupBy(
            F.col("event_type").alias("series_key"),
            F.expr("datediff(CAST(ts AS DATE), DATE '1995-01-01')")
            .cast("long").alias("idx"),
        )
        .agg(
            F.sum(F.expr("CASE WHEN value > 50 THEN 1 ELSE 0 END"))
            .cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("t"),
        )
        .localCheckpoint(eager=True)
    )
    cut = 1300
    d = tempfile.mkdtemp(prefix="stream-sprt-")
    early, late = os.path.join(d, "a"), os.path.join(d, "b")
    daily.where(F.col("idx") < cut).coalesce(1).write.parquet(early)
    daily.where(F.col("idx") >= cut).coalesce(1).write.parquet(late)
    now = _time.time()
    for root, base in ((early, now - 120), (late, now)):
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (base, base))
    src = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.sprt_stream(src, p0=0.3, p1=0.5)
    sw.run_stream_to_memory(plan, "sprt_stream_t", output_mode="update")
    got = {
        r["series_key"]: (r["n_periods"], r["decision"],
                          r["crossing_idx"])
        for r in spark.sql(
            """
            SELECT series_key, n_periods, decision, crossing_idx FROM (
              SELECT *, row_number() OVER (
                PARTITION BY series_key ORDER BY n_periods DESC) AS rn
              FROM sprt_stream_t
            ) WHERE rn = 1
            """
        ).collect()
    }
    for key in got:
        want = ops.sprt_test(
            daily.where(F.col("series_key") == key),
            "idx", "s", "t", p0=0.3, p1=0.5,
        ).collect()[0]
        assert got[key] == (
            want["n_periods"], want["decision"], want["crossing_idx"]
        ), key


def test_cuped_monitor_stream_matches_batch_across_micro_batches(spark):
    """CUPED streaming twin: the eleven-moment state folded over two
    micro-batches must land bit-exactly on the batch operator's one-row
    (theta, effects, var_reduction) over the same assignment frame —
    sums commute, so no ordered-feed contract applies."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    orders = testdata.load_table(spark, SF_DIR, "orders")
    cust = testdata.load_table(spark, SF_DIR, "customer") \
        .select("c_custkey", "c_acctbal")
    frame = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            F.col("o_orderstatus").alias("series_key"),
            F.col("o_totalprice").cast("double").alias("y"),
            F.col("c_acctbal").cast("double").alias("x"),
            F.expr("o_orderpriority = '1-URGENT'").alias("t"),
            F.col("o_orderkey").alias("k"),
        )
        .localCheckpoint(eager=True)
    )
    d = tempfile.mkdtemp(prefix="stream-cuped-")
    frame.where("k % 2 = 0").coalesce(1) \
        .write.parquet(os.path.join(d, "a"))
    frame.where("k % 2 = 1").coalesce(1) \
        .write.parquet(os.path.join(d, "b"))
    src = (
        spark.readStream.schema(frame.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.cuped_monitor_stream(src)
    sw.run_stream_to_memory(plan, "cuped_stream_t", output_mode="update")
    got = {
        r["series_key"]: (
            r["n_treat"], r["n_ctrl"], r["theta"], r["effect_raw"],
            r["effect_cuped"], r["var_reduction"],
        )
        for r in spark.sql(
            """
            SELECT * FROM (
              SELECT *, row_number() OVER (
                PARTITION BY series_key
                ORDER BY n_treat + n_ctrl DESC) AS rn
              FROM cuped_stream_t
            ) WHERE rn = 1
            """
        ).collect()
    }
    assert len(got) >= 2
    for key in got:
        want = ops.cuped_adjusted_effect(
            frame.where(F.col("series_key") == key),
            "y", "x", "t",
        ).collect()[0]
        assert got[key] == (
            want["n_treat"], want["n_ctrl"], want["theta"],
            want["effect_raw"], want["effect_cuped"],
            want["var_reduction"],
        ), key


def test_srm_monitor_stream_matches_batch_across_micro_batches(spark):
    """SRM streaming twin: per-arm counts folded over two micro-batches
    must re-emit exactly the batch srm_check report — including the
    NULL-expectation row for the arm outside the declared design."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    orders = testdata.load_table(spark, SF_DIR, "orders")
    frame = orders.select(
        F.lit("exp1").alias("series_key"),
        F.col("o_orderstatus").alias("arm"),
        F.col("o_orderkey").alias("k"),
    ).localCheckpoint(eager=True)
    d = tempfile.mkdtemp(prefix="stream-srm-")
    frame.where("k % 2 = 0").coalesce(1) \
        .write.parquet(os.path.join(d, "a"))
    frame.where("k % 2 = 1").coalesce(1) \
        .write.parquet(os.path.join(d, "b"))
    src = (
        spark.readStream.schema(frame.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    shares = {"F": 0.5, "O": 0.5}
    plan = sw.srm_monitor_stream(src, shares)
    sw.run_stream_to_memory(plan, "srm_stream_t", output_mode="update")
    latest = spark.sql(
        """
        SELECT * FROM (
          SELECT *, max(n_observed) OVER (PARTITION BY arm) AS mx,
                 row_number() OVER (
                   PARTITION BY arm ORDER BY n_observed DESC) AS rn
          FROM srm_stream_t
        ) WHERE rn = 1
        ORDER BY arm
        """
    ).collect()
    # the per-arm "latest" rows all come from the final micro-batch
    # (every emission rewrites every arm), so totals are consistent
    got = [
        (r["arm"], r["n_observed"], r["expected_share"],
         r["n_expected"], r["residual_z"], r["chi2_total"],
         r["df_total"])
        for r in latest
    ]
    want = [
        (r["arm"], r["n_observed"], r["expected_share"],
         r["n_expected"], r["residual_z"], r["chi2_total"],
         r["df_total"])
        for r in ops.srm_check(
            frame, "arm", shares
        ).collect()
    ]
    assert got == want


def test_srm_monitor_stream_nulls_pooled_when_no_known_arm(spark):
    """k_known = 0 (every observed arm outside the declared design):
    the pooled chi2/df must be NULL, matching the batch srm_check —
    a 0.0/-1 pair would read as a clean result."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="stream-srm0-")
    frame = spark.createDataFrame(
        [("exp1", "x", 1), ("exp1", "y", 2), ("exp1", "x", 3)],
        "series_key string, arm string, k long",
    )
    frame.coalesce(1).write.parquet(os.path.join(d, "a"))
    src = (
        spark.readStream.schema(frame.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.srm_monitor_stream(src, {"t": 0.5, "c": 0.5})
    sw.run_stream_to_memory(plan, "srm_stream_t0", output_mode="update")
    rows = spark.sql(
        "SELECT * FROM srm_stream_t0 ORDER BY arm"
    ).collect()
    assert [r["arm"] for r in rows] == ["x", "y"]
    for r in rows:
        assert r["expected_share"] is None
        assert r["chi2_total"] is None
        assert r["df_total"] is None


def test_psi_monitor_stream_matches_batch_across_micro_batches(spark):
    """PSI streaming twin: live bin counts folded over two
    micro-batches against a frozen reference snapshot must re-emit
    exactly the batch psi_drift report (same binning, same sorted-bin
    fold, same round-6)."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    orders = testdata.load_table(spark, SF_DIR, "orders")
    df_a = orders.where("o_orderstatus = 'F'")
    df_b = orders.where("o_orderstatus = 'O'")
    width = 10000.0
    want = ops.psi_drift(df_a, df_b, "o_totalprice", width).collect()[0]
    # the frozen deployment artifact: the reference side's exact bins,
    # computed with the batch operator's own binning expression
    ref_bins = {
        r["bin"]: r["c"]
        for r in df_a.where("o_totalprice IS NOT NULL").select(
            F.expr(f"CAST(floor(CAST(o_totalprice AS DOUBLE) "
                   f"/ {width!r}d) AS BIGINT)").alias("bin")
        ).groupBy("bin").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    frame = df_b.select(
        F.lit("m1").alias("series_key"),
        F.col("o_totalprice").cast("double").alias("x"),
        F.col("o_orderkey").alias("k"),
    ).localCheckpoint(eager=True)
    d = tempfile.mkdtemp(prefix="stream-psi-")
    frame.where("k % 2 = 0").coalesce(1) \
        .write.parquet(os.path.join(d, "a"))
    frame.where("k % 2 = 1").coalesce(1) \
        .write.parquet(os.path.join(d, "b"))
    src = (
        spark.readStream.schema(frame.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.psi_monitor_stream(src, ref_bins, width)
    sw.run_stream_to_memory(plan, "psi_stream_t", output_mode="update")
    got = spark.sql(
        "SELECT * FROM psi_stream_t ORDER BY n_b DESC LIMIT 1"
    ).collect()[0]
    assert (got["n_a"], got["n_b"]) == (want["n_a"], want["n_b"])
    assert got["n_bins"] == want["n_bins"]
    assert got["n_skipped_bins"] == want["n_skipped_bins"]
    assert got["psi"] == want["psi"]


def test_mmd_monitor_stream_matches_batch_across_micro_batches(spark):
    """MMD streaming twin: the live side's 8 exact RFF feature sums
    folded over two micro-batches against frozen (sigma, reference
    feature sums) must re-emit exactly the batch mmd_rff statistic."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    orders = testdata.load_table(spark, SF_DIR, "orders")
    want = ops.mmd_rff(
        orders, "o_totalprice", "o_orderstatus", "F", "O"
    ).collect()[0]
    sigma = want["sigma"]
    ref = ops.mmd_reference_features(
        orders.where("o_orderstatus = 'F'"), "o_totalprice", sigma
    ).collect()[0].asDict()
    frame = orders.where("o_orderstatus = 'O'").select(
        F.lit("m1").alias("series_key"),
        F.col("o_totalprice").cast("double").alias("x"),
        F.col("o_orderkey").alias("k"),
    ).localCheckpoint(eager=True)
    d = tempfile.mkdtemp(prefix="stream-mmd-")
    frame.where("k % 2 = 0").coalesce(1) \
        .write.parquet(os.path.join(d, "a"))
    frame.where("k % 2 = 1").coalesce(1) \
        .write.parquet(os.path.join(d, "b"))
    src = (
        spark.readStream.schema(frame.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.mmd_monitor_stream(src, sigma, ref)
    sw.run_stream_to_memory(plan, "mmd_stream_t", output_mode="update")
    got = spark.sql(
        "SELECT * FROM mmd_stream_t ORDER BY n_b DESC LIMIT 1"
    ).collect()[0]
    assert (got["n_a"], got["n_b"]) == (want["n_a"], want["n_b"])
    assert got["sigma"] == want["sigma"]
    assert got["mmd2"] == want["mmd2"]


def test_cusum_stream_matches_batch_across_micro_batches(spark):
    """CUSUM streaming twin: the O(1) prefix/min/peak state replayed
    over two ordered micro-batches must equal the batch operator when
    the monitor target equals the batch's estimated level."""
    import os
    import tempfile
    import time as _time

    from concept_multi_db_query_engine_spark import operators as ops

    daily = (
        testdata.load_table(spark, SF_DIR, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("series_key"),
            F.expr("datediff(CAST(o_orderdate AS DATE), "
                   "DATE '1992-01-01')").cast("long").alias("idx"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
        .localCheckpoint(eager=True)
    )
    cut = 1200
    d = tempfile.mkdtemp(prefix="stream-cusum-")
    early, late = os.path.join(d, "a"), os.path.join(d, "b")
    daily.where(F.col("idx") < cut).coalesce(1).write.parquet(early)
    daily.where(F.col("idx") >= cut).coalesce(1).write.parquet(late)
    now = _time.time()
    for root, base in ((early, now - 120), (late, now)):
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (base, base))
    # per-key batch reference (and its estimated target level)
    want = {}
    for key in [r["series_key"]
                for r in daily.select("series_key").distinct().collect()]:
        row = ops.cusum_control(
            daily.where(F.col("series_key") == key), "idx", "x"
        ).collect()[0]
        want[key] = row
    # all five series share the same daily-count level — a single-mu
    # stream only matches exactly if the batch mus agree, so pin one key
    key = sorted(want)[0]
    src = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
        .where(F.col("series_key") == key)
    )
    plan = sw.cusum_stream(src, mu=want[key]["mu"])
    sw.run_stream_to_memory(plan, "cusum_stream_t", output_mode="update")
    got = spark.sql(
        """
        SELECT * FROM (
          SELECT *, row_number() OVER (
            PARTITION BY series_key ORDER BY n_periods DESC) AS rn
          FROM cusum_stream_t
        ) WHERE rn = 1
        """
    ).collect()[0]
    w = want[key]
    assert got["n_periods"] == w["n_periods"]
    assert got["cusum_pos_max"] == w["cusum_pos_max"]
    assert got["cusum_neg_max"] == w["cusum_neg_max"]
    assert got["pos_peak_idx"] == w["pos_peak_idx"]
    assert got["neg_peak_idx"] == w["neg_peak_idx"]


def test_bollinger_stream_matches_batch_across_micro_batches(spark):
    """Bollinger streaming twin: the ring-buffer state replayed over
    two ordered micro-batches must emit exactly the batch operator's
    per-period rows (full windows only), including the windows that
    STRADDLE the batch boundary."""
    import os
    import tempfile
    import time as _time

    from concept_multi_db_query_engine_spark import operators as ops

    daily = (
        testdata.load_table(spark, SF_DIR, "orders")
        .groupBy(F.expr("datediff(CAST(o_orderdate AS DATE), "
                        "DATE '1992-01-01')").cast("long").alias("idx"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
        .select(F.lit("orders").alias("series_key"), "idx", "x")
        .localCheckpoint(eager=True)
    )
    cut = 1200
    d = tempfile.mkdtemp(prefix="stream-boll-")
    early, late = os.path.join(d, "a"), os.path.join(d, "b")
    daily.where(F.col("idx") < cut).coalesce(1).write.parquet(early)
    daily.where(F.col("idx") >= cut).coalesce(1).write.parquet(late)
    now = _time.time()
    for root, base in ((early, now - 120), (late, now)):
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (base, base))
    src = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.bollinger_stream(src, window=20, k=2.0)
    sw.run_stream_to_memory(plan, "boll_stream_t", output_mode="update")
    got = sorted(
        (r["idx"], r["value"], r["sma"], r["band_lo"], r["band_hi"],
         r["breach"])
        for r in spark.sql("SELECT * FROM boll_stream_t").collect()
    )
    want = sorted(
        (r["idx"], r["value"], r["sma"], r["band_lo"], r["band_hi"],
         r["breach"])
        for r in ops.bollinger_bands(
            daily, "idx", "x", window=20, k=2.0
        ).collect()
    )
    assert len(got) == len(want) and got == want


def test_shewhart_stream_matches_batch_with_frozen_limits(spark):
    """Shewhart phase-II twin: subgroups completed across two ordered
    micro-batches must reproduce the batch chart's per-subgroup
    (xbar, r, limits, flags) when the stream monitors against the
    batch-estimated center lines."""
    import math
    import os
    import tempfile
    import time as _time

    from concept_multi_db_query_engine_spark import operators as ops

    def half_away(v):
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    rng_vals = [float((i * 37) % 90 + 10) for i in range(70)]
    sub = 5
    rows = [(f"{i // sub:04d}", i, v) for i, v in enumerate(rng_vals)]
    frame = spark.createDataFrame(rows, "sg string, idx long, x double")
    batch = {
        r["subgroup"]: r
        for r in ops.shewhart_xbar_r(frame, "sg", "x", sub).collect()
    }
    # the batch op's center lines, recomputed with its exact lattice
    xbars, ranges = [], []
    for g in sorted({r[0] for r in rows}):
        vals = [half_away(v * 1e6) for s, _, v in rows if s == g]
        xbars.append(half_away(sum(vals) / float(sub)))
        ranges.append(max(vals) - min(vals))
    gx_q = half_away(sum(xbars) / float(len(xbars)))
    rb_q = half_away(sum(ranges) / float(len(ranges)))
    d = tempfile.mkdtemp(prefix="stream-shew-")
    early, late = os.path.join(d, "a"), os.path.join(d, "b")
    stream_rows = frame.select(
        F.lit("s1").alias("series_key"), "idx", "x"
    ).localCheckpoint(eager=True)
    stream_rows.where("idx < 33").coalesce(1).write.parquet(early)
    stream_rows.where("idx >= 33").coalesce(1).write.parquet(late)
    now = _time.time()
    for root, base in ((early, now - 120), (late, now)):
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (base, base))
    src = (
        spark.readStream.schema(stream_rows.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.shewhart_stream(
        src, subgroup_size=sub, gx=gx_q / 1e6, rb=rb_q / 1e6,
    )
    sw.run_stream_to_memory(plan, "shew_stream_t", output_mode="update")
    got = {
        r["subgroup_idx"]: r
        for r in spark.sql("SELECT * FROM shew_stream_t").collect()
    }
    assert len(got) == len(batch) == 14
    for j, g in enumerate(sorted(batch)):
        b = batch[g]
        s = got[j]
        assert s["xbar"] == b["xbar"] and s["r"] == b["r"], g
        assert s["xbar_ucl"] == b["xbar_ucl"], g
        assert s["xbar_lcl"] == b["xbar_lcl"], g
        assert s["r_ucl"] == b["r_ucl"] and s["r_lcl"] == b["r_lcl"], g
        assert s["ooc_mean"] == b["ooc_mean"], g
        assert s["ooc_range"] == b["ooc_range"], g


def test_kmv_distinct_stream_matches_batch_across_micro_batches(spark):
    """KMV streaming twin: the k smallest md5 hashes merged over two
    micro-batches must re-emit exactly the batch approx_distinct_kmv
    sketch over everything ingested — same hash, same (k-1)/max_h,
    same round-4/round-6 canon (the sketch state is O(k) and the
    merge rule is union-then-keep-k-smallest)."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    orders = testdata.load_table(spark, SF_DIR, "orders")
    # pre-cast to STRING once so batch and stream hash the identical
    # rendering (the twin's documented value_col contract)
    frame = orders.select(
        F.lit("m1").alias("series_key"),
        F.concat(F.lit("cust"), F.col("o_custkey").cast("string"))
        .alias("v"),
        F.col("o_orderkey").alias("k"),
    ).localCheckpoint(eager=True)
    want = ops.approx_distinct_kmv(frame, "v", k=64).collect()[0]
    d = tempfile.mkdtemp(prefix="stream-kmv-")
    frame.where("k % 2 = 0").coalesce(1) \
        .write.parquet(os.path.join(d, "a"))
    frame.where("k % 2 = 1").coalesce(1) \
        .write.parquet(os.path.join(d, "b"))
    src = (
        spark.readStream.schema(frame.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.kmv_distinct_stream(src, k=64)
    sw.run_stream_to_memory(plan, "kmv_stream_t", output_mode="update")
    got = spark.sql(
        "SELECT * FROM kmv_stream_t ORDER BY n_rows DESC LIMIT 1"
    ).collect()[0]
    assert got["k_used"] == want["k_used"] == 64
    assert got["approx_distinct"] == want["approx_distinct"]
    assert got["max_h"] == want["max_h"]


def test_kmv_distinct_stream_exact_below_k(spark):
    """k_used < k degrades to the exact distinct count — the standard
    KMV contract, preserved by the twin."""
    import os
    import tempfile

    rows = [("m1", f"val{i % 7}", i) for i in range(40)]
    frame = spark.createDataFrame(
        rows, "series_key string, v string, k long"
    )
    d = tempfile.mkdtemp(prefix="stream-kmv2-")
    frame.where("k % 2 = 0").coalesce(1) \
        .write.parquet(os.path.join(d, "a"))
    frame.where("k % 2 = 1").coalesce(1) \
        .write.parquet(os.path.join(d, "b"))
    src = (
        spark.readStream.schema(frame.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.kmv_distinct_stream(src, k=64)
    sw.run_stream_to_memory(plan, "kmv_stream_t2", output_mode="update")
    got = spark.sql(
        "SELECT * FROM kmv_stream_t2 ORDER BY n_rows DESC LIMIT 1"
    ).collect()[0]
    assert got["n_rows"] == 40
    assert got["k_used"] == 7


def test_elo_rating_stream_matches_batch_across_micro_batches(spark):
    """Elo streaming twin: sequential rating updates carried across
    two micro-batches (including the pair that straddles the batch
    boundary) must re-emit exactly the batch elo_preference_ratings
    replay over everything ingested — same integer-micro lattice,
    same Bradley-Terry-link update, same (order, group, value) pair
    derivation."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    orders = testdata.load_table(spark, SF_DIR, "orders")
    n = orders.count()
    want = {
        r["grp"]: r
        for r in ops.elo_preference_ratings(
            orders, "o_orderpriority", "o_totalprice", "o_orderkey",
            n_matches=int(n) + 1,
        ).collect()
    }
    frame = orders.select(
        F.lit("m1").alias("series_key"),
        F.col("o_orderkey").alias("o"),
        F.col("o_orderpriority").alias("g"),
        F.col("o_totalprice").cast("double").alias("v"),
    )
    mid = frame.agg(F.expr("percentile_approx(o, 0.5)")).collect()[0][0]
    d = tempfile.mkdtemp(prefix="stream-elo-")
    # split by ORDER (not parity): the feed contract is ordered arrival
    frame.where(F.col("o") <= mid).coalesce(1) \
        .write.parquet(os.path.join(d, "a"))
    frame.where(F.col("o") > mid).coalesce(1) \
        .write.parquet(os.path.join(d, "b"))
    src = (
        spark.readStream.schema(frame.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.elo_rating_stream(src)
    sw.run_stream_to_memory(plan, "elo_stream_t", output_mode="update")
    got = {
        r["grp"]: r
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY "
            "grp ORDER BY n_played DESC) AS __rk FROM elo_stream_t) "
            "WHERE __rk = 1"
        ).collect()
    }
    assert set(got) == set(want)
    for g in want:
        assert got[g]["n_played"] == want[g]["n_played"], g
        assert got[g]["wins"] == want[g]["wins"], g
        assert got[g]["rating"] == want[g]["rating"], g


def test_elo_rating_stream_matches_batch_on_nan_values(spark):
    """NaN alignment (round-12 ADVICE): the stream's Arrow->pandas
    conversion maps NULL to NaN, so pandas dropna removes NaN-valued
    rows — the batch operator's filter excludes NaN too (NOT isnan),
    and the pinned stream==batch equality must hold on a feed that
    carries a NaN value."""
    import math
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    rows = [
        ("m1", 1, "a", 10.0), ("m1", 2, "b", 5.0),
        ("m1", 3, "a", float("nan")),  # dropped identically both paths
        ("m1", 4, "b", 7.0), ("m1", 5, "a", 2.0),
        ("m1", 6, "b", 9.0), ("m1", 7, "a", 11.0),
        ("m1", 8, "b", 1.0),
    ]
    frame = spark.createDataFrame(
        rows, "series_key string, o long, g string, v double")
    want = {
        r["grp"]: r
        for r in ops.elo_preference_ratings(
            frame, "g", "v", "o", n_matches=100,
        ).collect()
    }
    # the NaN row must not have been paired: 7 surviving rows -> 6
    # consecutive pairs, one of which (o=2,o=4: both 'b') is same-group
    # skipped -> 5 matches -> 10 group-participations
    assert sum(r["n_played"] for r in want.values()) == 10
    assert not any(math.isnan(r["rating"]) for r in want.values())
    d = tempfile.mkdtemp(prefix="stream-elo-nan-")
    frame.where("o <= 4").coalesce(1).write.parquet(os.path.join(d, "a"))
    frame.where("o > 4").coalesce(1).write.parquet(os.path.join(d, "b"))
    src = (
        spark.readStream.schema(frame.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.elo_rating_stream(src)
    sw.run_stream_to_memory(plan, "elo_stream_nan_t", output_mode="update")
    got = {
        r["grp"]: r
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY "
            "grp ORDER BY n_played DESC) AS __rk FROM elo_stream_nan_t) "
            "WHERE __rk = 1"
        ).collect()
    }
    assert set(got) == set(want)
    for g in want:
        assert got[g]["n_played"] == want[g]["n_played"], g
        assert got[g]["wins"] == want[g]["wins"], g
        assert got[g]["rating"] == want[g]["rating"], g


def test_importance_weights_scores_a_stream_with_frozen_models(spark):
    """importance_weights' documented streaming posture: fit both
    unigram models on BATCH frames (model fitting collects), then
    score a readStream frame — the scoring leg is a pure narrow map,
    so per-doc stream scores must equal the batch run."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    docs = testdata.load_table(spark, SF_DIR, "documents") \
        .select("doc_id", "text")
    target = testdata.load_table(spark, SF_DIR, "documents") \
        .where("lang = 'en'").select("doc_id", "text")
    want = {
        r["doc_id"]: r["avg_log_ratio"]
        for r in ops.importance_weights(
            docs, target, top_n=50, source=docs).collect()
    }
    d = tempfile.mkdtemp(prefix="stream-dsir-")
    docs.write.parquet(os.path.join(d, "a"))
    src = spark.readStream.schema(docs.schema) \
        .parquet(os.path.join(d, "*"))
    plan = ops.importance_weights(src, target, top_n=50, source=docs)
    sw.run_stream_to_memory(plan, "dsir_stream_t", output_mode="append")
    got = {
        r["doc_id"]: r["avg_log_ratio"]
        for r in spark.sql("SELECT * FROM dsir_stream_t").collect()
    }
    assert got == want


def test_decontamination_stream_matches_batch(spark):
    """Round-13 twin: the frozen-eval decontamination narrow map must
    flag a streamed corpus to the exact batch rows (the shared core
    is stateless, so the union of micro-batch emissions == batch
    output minus only the deterministic sort)."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    emb = testdata.load_table(spark, SF_DIR, "embeddings")
    corpus, ev = emb.where("vec_id % 37 != 0"), emb.where("vec_id % 37 = 0")
    want = sorted(
        (r["vec_id"], r["eval_id"], r["cosine"])
        for r in ops.embedding_decontamination(
            corpus, ev, threshold=0.3).collect()
    )
    assert len(want) > 0
    d = tempfile.mkdtemp(prefix="stream-decon-")
    corpus.where("vec_id % 2 = 0").coalesce(1) \
        .write.parquet(os.path.join(d, "a"))
    corpus.where("vec_id % 2 = 1").coalesce(1) \
        .write.parquet(os.path.join(d, "b"))
    src = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.decontamination_stream(src, ev, threshold=0.3)
    sw.run_stream_to_memory(plan, "decon_stream_t", output_mode="append")
    got = sorted(
        (r["vec_id"], r["eval_id"], r["cosine"])
        for r in spark.sql("SELECT * FROM decon_stream_t").collect()
    )
    assert got == want


def test_tokenizer_fertility_stream_matches_batch(spark):
    """Round-13 twin: running per-source fertility in update mode —
    the last emission per source equals the batch report over
    everything ingested (ratios recomputed per emission from exact
    integer running sums)."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    docs = testdata.load_table(spark, SF_DIR, "documents")
    want = {r["source"]: r
            for r in ops.tokenizer_fertility_ab(docs).collect()}
    d = tempfile.mkdtemp(prefix="stream-fert-")
    docs.where("doc_id % 2 = 0").coalesce(1) \
        .write.parquet(os.path.join(d, "a"))
    docs.where("doc_id % 2 = 1").coalesce(1) \
        .write.parquet(os.path.join(d, "b"))
    src = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.tokenizer_fertility_stream(src)
    sw.run_stream_to_memory(plan, "fert_stream_t", output_mode="update")
    got = {
        r["source"]: r
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY "
            "source ORDER BY n_docs DESC) AS __rk FROM fert_stream_t) "
            "WHERE __rk = 1"
        ).collect()
    }
    assert set(got) == set(want)
    for s in want:
        for c in ("n_docs", "total_bytes", "words", "tokens_bpe",
                  "bpe_per_word", "ws_per_100b", "bpe_per_100b"):
            assert got[s][c] == want[s][c], (s, c)


def test_hashed_ngram_score_stream_matches_batch(spark):
    """Round-14 twin: frozen-weights hashed n-gram scoring is a pure
    narrow map, so the union of append-mode emissions over a streamed
    corpus equals the batch scorer row-for-row."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops

    docs = testdata.load_table(spark, SF_DIR, "documents") \
        .where("lang IS NOT NULL")
    frame, feats = ops.hashed_ngram_features(
        docs, n_buckets=16, salt="st14")
    w = ops.logistic_train(
        frame, feats, "CASE WHEN lang = 'en' THEN 1 ELSE 0 END",
        lr=0.5, iterations=4)
    want = sorted(
        (r["doc_id"], r["score"], r["predicted"])
        for r in ops.logistic_score(frame, w, feats).collect()
    )
    d = tempfile.mkdtemp(prefix="stream-ftlid-")
    docs.where("doc_id % 2 = 0").coalesce(1) \
        .write.parquet(os.path.join(d, "a"))
    docs.where("doc_id % 2 = 1").coalesce(1) \
        .write.parquet(os.path.join(d, "b"))
    src = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.hashed_ngram_score_stream(
        src, w, n_buckets=16, salt="st14")
    sw.run_stream_to_memory(plan, "ftlid_stream_t", output_mode="append")
    got = sorted(
        (r["doc_id"], r["score"], r["predicted"])
        for r in spark.sql("SELECT * FROM ftlid_stream_t").collect()
    )
    assert got == want


def test_prefs_margin_stream_matches_batch(spark):
    """Round-14 twin: running per-domain preference health in update
    mode — the last emission per domain equals the batch report over
    everything ingested (ratios recomputed per emission from exact
    integer running sums)."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops
    from pyspark.sql import functions as F

    docs = testdata.load_table(spark, SF_DIR, "documents")
    pairs = docs.where("text IS NOT NULL AND n_chars IS NOT NULL").select(
        F.col("source").alias("domain"),
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)")
        .alias("chosen_tokens"),
        F.expr("CAST(n_chars % 37 AS BIGINT)").alias("rejected_tokens"),
        F.expr("CAST(n_chars AS DOUBLE)").alias("chosen_reward"),
        F.expr("CAST(n_chars % 251 AS DOUBLE)").alias("rejected_reward"),
    )
    want = {r["domain"]: r
            for r in ops.preference_pair_report(pairs).collect()}
    d = tempfile.mkdtemp(prefix="stream-prefs-")
    sub_a = pairs.where("chosen_tokens % 2 = 0")
    sub_b = pairs.where("chosen_tokens % 2 = 1")
    sub_a.coalesce(1).write.parquet(os.path.join(d, "a"))
    sub_b.coalesce(1).write.parquet(os.path.join(d, "b"))
    src = (
        spark.readStream.schema(pairs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.prefs_margin_stream(src)
    sw.run_stream_to_memory(plan, "prefs_stream_t", output_mode="update")
    got = {
        r["domain"]: r
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY "
            "domain ORDER BY n_pairs DESC) AS __rk FROM prefs_stream_t) "
            "WHERE __rk = 1"
        ).collect()
    }
    assert set(got) == set(want)
    for dom in want:
        for c in ("n_pairs", "mean_margin", "frac_margin_nonpos",
                  "mean_chosen_tokens", "mean_rejected_tokens",
                  "frac_chosen_longer"):
            assert got[dom][c] == want[dom][c], (dom, c)


def test_sft_turn_admission_stream_matches_batch(spark):
    """Round-14 twin: the live admission set (one emission per unique
    assistant-turn fingerprint) equals the batch-distinct fingerprint
    set, and every duplicate the batch operator flags has its
    canonical admitted exactly once."""
    import os
    import tempfile

    from concept_multi_db_query_engine_spark import operators as ops
    from pyspark.sql import functions as F

    docs = testdata.load_table(spark, SF_DIR, "documents")
    turns = docs.where("text IS NOT NULL").select(
        F.col("doc_id").alias("conv_id"),
        F.expr("split(text, ' ')").alias("w"),
    ).select(
        "conv_id",
        F.posexplode(F.expr(
            "transform(sequence(0, CAST((size(w) - 1) / 8 AS INT)), "
            "i -> concat_ws(' ', slice(w, i * 8 + 1, 8)))"
        )).alias("turn_idx", "text"),
    ).withColumn("role", F.expr(
        "CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END"))
    want_fps = {
        r["f"] for r in turns.where("role = 'assistant'")
        .select(F.md5("text").alias("f")).distinct().collect()
    }
    flagged = {r["fingerprint"]
               for r in ops.conversation_turn_dedup(turns).collect()}
    assert flagged  # the corpus genuinely has duplicate turns
    d = tempfile.mkdtemp(prefix="stream-sftadm-")
    turns.where("conv_id % 2 = 0").coalesce(1) \
        .write.parquet(os.path.join(d, "a"))
    turns.where("conv_id % 2 = 1").coalesce(1) \
        .write.parquet(os.path.join(d, "b"))
    src = (
        spark.readStream.schema(turns.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "*"))
    )
    plan = sw.sft_turn_admission_stream(src)
    sw.run_stream_to_memory(plan, "sftadm_stream_t",
                            output_mode="append")
    admitted = [r["fingerprint"] for r in spark.sql(
        "SELECT fingerprint FROM sftadm_stream_t").collect()]
    assert len(admitted) == len(set(admitted))  # one emission each
    assert set(admitted) == want_fps
    assert flagged <= set(admitted)  # every dup's canonical admitted
