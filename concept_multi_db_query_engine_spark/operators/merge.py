"""Batch merge/compaction — the write-side operators a CDC pipeline needs.

The reference lists write operations as explicit future scope
(README.md:754); a large-scale pipeline cannot wait for them: nightly
compaction of a change stream into a snapshot (upsert + delete, latest
version wins) is how every lakehouse table stays current.  This module
implements that merge Spark-first: one union, one hash shuffle on the key,
one row_number window — the exact shape Delta/Iceberg MERGE compiles to
when no file-level pruning applies, and AQE's skew-join handles hot keys.

Determinism: version ties break toward the CHANGE side then by a stable
provenance flag, so the merge is bit-reproducible and SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_latest_wins(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: str | list[str],
    version_col: str = "version",
    delete_col: str | None = None,
) -> DataFrame:
    """Merges a change batch into a snapshot with latest-wins semantics:
    per key, the row with the highest ``version_col`` survives (a change
    beats the snapshot at equal version — the CDC convention, since the
    change is newer information), and if the winning row is flagged in
    ``delete_col`` the key disappears from the result.

    Both frames must share the snapshot's columns; ``delete_col`` (when
    given) may exist only in ``changes`` — the snapshot side is treated
    as not-deleted.  Returns the merged snapshot with the input columns
    (``delete_col`` removed).

    Scale: one ``unionByName`` (no data movement) and ONE hash exchange
    on the key for the per-key window; at 100 TB this is the minimal
    shuffle any keyed merge needs, and bucketing both sides by the key
    (``bucketing.py``) removes even that.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    s = snapshot.withColumn("__chg", F.lit(0))
    c = changes.withColumn("__chg", F.lit(1))
    if delete_col is not None:
        if delete_col not in c.columns:
            raise ValueError(f"changes lacks delete column {delete_col!r}")
        if delete_col not in s.columns:
            s = s.withColumn(delete_col, F.lit(False))
        s = s.withColumn("__del", F.coalesce(F.col(delete_col),
                                             F.lit(False)))
        c = c.withColumn("__del", F.coalesce(F.col(delete_col),
                                             F.lit(False)))
    else:
        s = s.withColumn("__del", F.lit(False))
        c = c.withColumn("__del", F.lit(False))
    # final tiebreaker: two CHANGE rows sharing (key, version) — e.g. a
    # replayed CDC batch — would otherwise pick a partition-order-dependent
    # winner; a stable hash of the payload columns keeps the merge
    # bit-reproducible regardless of input order
    payload = [c for c in s.columns if c not in (*keys, "__chg", "__del")]
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("__chg").desc(),
        F.xxhash64(*[F.col(c) for c in payload]).asc(),
    )
    merged = (
        s.unionByName(c.select(*s.columns))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .where(~F.col("__del"))
    )
    drop = ["__chg", "__del", "__rn"]
    if delete_col is not None:
        drop.append(delete_col)
    return merged.drop(*drop)


def incremental_state_merge(
    state: DataFrame,
    batch: DataFrame,
    key_cols: str | list[str],
    value_col: str,
    dec: str = "decimal(18,2)",
) -> DataFrame:
    """Merges a persisted per-key aggregate STATE with a new RAW batch
    using only algebraic (mergeable) statistics — cnt, decimal-exact
    sum, min, max: ``merge(state(A), reduce(B)) == reduce(A ∪ B)``
    bit-for-bit, because every statistic is associative/commutative and
    the sum is exact decimal (never an order-dependent float).  This is
    the pattern that makes daily rollups incremental at 100 TB: the new
    batch reduces map-side to per-key partials, the two tiny state
    frames union, and one re-reduce keyed on the same columns yields
    the next state — the full history is never rescanned.

    ``state`` must carry (key…, cnt, vsum, vmin, vmax) — the output of
    a previous call or of :func:`reduce_to_state`.  Returns the merged
    state with the same schema.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    partial = reduce_to_state(batch, keys, value_col, dec)
    return (
        state.unionByName(partial)
        .groupBy(*keys)
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("vsum").cast(dec).alias("vsum"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )


def reduce_to_state(
    df: DataFrame,
    key_cols: str | list[str],
    value_col: str,
    dec: str = "decimal(18,2)",
) -> DataFrame:
    """Reduces raw rows to the per-key algebraic state
    (key…, cnt, vsum, vmin, vmax) :func:`incremental_state_merge`
    consumes — one map-side-combined aggregation."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    v = F.col(value_col).cast(dec)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(v).cast(dec).alias("vsum"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
    )


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change stream
    (Kimball SCD2): every change row becomes a VERSIONED dimension row
    with an effective interval — ``valid_from`` = its own timestamp,
    ``valid_to`` = the NEXT change's timestamp for the same key (NULL
    while current) — the standard "what did this row look like at time
    t" table that an upsert compaction (:func:`upsert_latest_wins`)
    throws away.

    ONE keyed window (partition by key, order by (ts, tiebreak)) —
    a single shuffle on the key, ``lead`` for the interval end, no
    joins, no driver state; the tiebreaker makes same-timestamp change
    ordering deterministic, so intervals are bit-identical across
    engines and partitionings.  Point-in-time lookup is then a range
    predicate (``valid_from <= t AND (valid_to IS NULL OR t <
    valid_to)``) — at 100 TB pair it with partitioning on the key and
    zone maps on ``valid_from``.

    Returns (*key_cols, *attr_cols, valid_from, valid_to, is_current,
    version) with version numbering each key's changes from 1.
    """
    from pyspark.sql import Window

    if not key_cols or not attr_cols:
        raise ValueError("key_cols and attr_cols must be non-empty")
    return (
        changes.select(
            *key_cols, *attr_cols,
            F.col(ts_col).alias("valid_from"),
            F.col(tiebreak_col).alias("__tb"),
        )
        .withColumn(
            "valid_to",
            F.lead("valid_from").over(
                Window.partitionBy(*key_cols).orderBy(
                    F.col("valid_from").asc(), F.col("__tb").asc())),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn(
            "version",
            F.row_number().over(
                Window.partitionBy(*key_cols).orderBy(
                    F.col("valid_from").asc(), F.col("__tb").asc())),
        )
        .drop("__tb")
    )


def table_digest(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-free table content digest — the replication/CDC validator:
    two tables hold identical ROW MULTISETS iff their digests match,
    with no sorting and no row-by-row diff shipping.  Each row hashes
    to a 48-bit integer via md5 over its unit-separated column string
    (md5 exists with identical output on every engine — the repo's
    hash discipline), and the digest is the exact SUM of those
    integers in DECIMAL(38,0) (commutative, so partitioning- and
    order-independent), rendered as a string.

    ONE full scan into a single-row aggregate — the cheapest possible
    equality certificate for a 100 TB replica (compare after
    :func:`upsert_latest_wins` compaction, across engines, or before/
    after a migration).  Collision odds: 48-bit row hashes summed
    exactly; an adversary aside, a mismatched multiset collides with
    probability ~n/2^48.

    PORTABILITY CONTRACT: pass columns whose STRING rendering is
    engine-independent — integers and strings always are; render
    doubles/timestamps to canonical ints upstream (cents, epoch
    micros) before digesting.  NULL encodes as the sentinel
    ``<NULL>``.  Returns one row: (n_rows, digest).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    parts = ", ".join(
        f"coalesce(CAST(({c}) AS STRING), '<NULL>')" for c in cols
    )
    h = (
        f"CAST(conv(substring(md5(concat_ws(char(31), {parts})), 1, 12), "
        "16, 10) AS BIGINT)"
    )
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr(
            f"CAST(coalesce(sum(CAST(({h}) AS DECIMAL(38,0))), 0) "
            "AS STRING)"
        ).alias("digest"),
    )
