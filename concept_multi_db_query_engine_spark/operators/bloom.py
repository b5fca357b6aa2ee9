"""Bloom-filter semi-join pruning — the explicit runtime-filter lever.

At 100 TB the cheapest join is the one whose fact side never enters the
shuffle: when the dimension side's key set fits a few KB of bits, a Bloom
filter of it can be broadcast and applied as a NARROW MAP on the fact scan,
discarding non-matching rows before any exchange.  Spark's own
``InjectRuntimeFilter`` does this opportunistically (and its internal
thresholds keep it dormant at test scale — see PLANS.md); this module makes
the pattern explicit, controllable, and oracle-checkable.

Determinism discipline: bit positions come from the repo's md5 idiom
(``md5(key:salt:j) % n_bits`` per hash function j), and the filter is held
as an array of 32-bit words in BIGINT lanes (bit index < 32, so
``shiftleft`` never touches the sign bit on any engine).  The packed filter
is ONE broadcast row of model data; both the build and the probe replay
value-for-value in DuckDB, so even the false positives are bit-identical
cross-engine.

Reference behavior parity: the reference has no bloom surface (its stores
prune internally); this extends the engine the way the layout/skew
families do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD_BITS = 32  # sign-safe shift width in both Spark and DuckDB


def _bit_expr(key_col: str, salt: str, n_bits: int) -> str:
    """Bit position of hash function ``j`` (a column in scope) for a key."""
    return (
        f"CAST(conv(substring(md5(concat(CAST({key_col} AS STRING), "
        f"':{salt}:', CAST(j AS STRING))), 1, 15), 16, 10) AS BIGINT) "
        f"% {n_bits}"
    )


def bloom_filter_words(
    keys: DataFrame,
    key_col: str,
    n_bits: int = 8192,
    n_hashes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Builds the packed Bloom filter for ``keys[key_col]`` as ONE row
    holding an array of ``n_bits / 32`` BIGINT words (each using its low
    32 bits).  Build shape: every key explodes into its ``n_hashes`` bit
    positions, a map-side-combined ``bit_or`` groupBy reduces them to at
    most ``n_bits/32`` word rows, and ``map_from_entries`` +
    ``transform(sequence(...))`` densifies the words into the final
    array — all JVM-side; the only row that ever reaches the driver is
    the one the caller broadcasts."""
    if n_bits < _WORD_BITS or n_bits % _WORD_BITS != 0:
        raise ValueError(f"n_bits must be a positive multiple of "
                         f"{_WORD_BITS}")
    if n_hashes < 1:
        raise ValueError("n_hashes must be >= 1")
    n_words = n_bits // _WORD_BITS
    bit = _bit_expr(key_col, salt, n_bits)
    words = (
        keys.select(
            F.explode(F.expr(f"sequence(0, {n_hashes - 1})")).alias("j"),
            F.col(key_col),
        )
        .select(F.expr(bit).alias("bit"))
        .select(
            (F.col("bit") / _WORD_BITS).cast("int").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(bit % {_WORD_BITS} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )
    return words.agg(
        F.expr(
            f"transform(sequence(0, {n_words - 1}), i -> coalesce("
            "element_at(map_from_entries(collect_list("
            "struct(word_idx, word))), i), CAST(0 AS BIGINT)))"
        ).alias("bloom_words")
    )


def _probe_expr(
    key_col: str, n_bits: int, n_hashes: int, salt: str,
    words_col: str = "bloom_words",
) -> str:
    """Boolean SQL text: every hash bit of ``key_col`` set in the filter."""
    tests = []
    for j in range(n_hashes):
        bit = (
            f"(CAST(conv(substring(md5(concat(CAST({key_col} AS STRING), "
            f"':{salt}:', '{j}')), 1, 15), 16, 10) AS BIGINT) % {n_bits})"
        )
        tests.append(
            f"((element_at({words_col}, "
            f"CAST({bit} DIV {_WORD_BITS} AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST({bit} % {_WORD_BITS} AS INT))) != 0)"
        )
    return "(" + " AND ".join(tests) + ")"


def bloom_prefilter(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 8192,
    n_hashes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Fact rows whose ``fact_key`` passes the Bloom filter built from
    ``dim_keys[dim_key]`` — a conservative superset of the semi-join
    result (no false negatives; false positives bounded by the standard
    (1−e^{−kn/m})^k rate).  The filter rides in as a broadcast
    nested-loop of ONE packed row and the probe is a pure narrow map on
    the fact scan — no shuffle, no exchange, which is the whole point:
    place it UPSTREAM of a shuffle join and the exchange carries only
    the surviving rows."""
    words = bloom_filter_words(dim_keys, dim_key, n_bits, n_hashes, salt)
    probe = _probe_expr(fact_key, n_bits, n_hashes, salt)
    return fact.crossJoin(F.broadcast(words)).where(F.expr(probe)) \
        .drop("bloom_words")


def bloom_join_report(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 8192,
    n_hashes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """The calibration query for sizing a Bloom prefilter: one row with
    (n_fact, n_pass, n_match, n_false_pos, fp_rate_ppm) — how many fact
    rows exist, how many the filter passes, how many truly match the
    dimension key set (exact semi-join), and the realized
    false-positive rate among true non-matches in exact integer ppm.
    Deterministic md5 bits make even the false positives replayable, so
    the whole report carries a value-checked oracle."""
    words = bloom_filter_words(dim_keys, dim_key, n_bits, n_hashes, salt)
    probe = _probe_expr("__fk", n_bits, n_hashes, salt)
    dimset = dim_keys.select(F.col(dim_key).alias("__k")).distinct()
    tagged = (
        fact.select(F.col(fact_key).alias("__fk"))
        .crossJoin(F.broadcast(words))
        .withColumn("__pass", F.expr(probe))
        .join(
            F.broadcast(dimset.withColumn("__m", F.lit(1))),
            F.col("__fk") == F.col("__k"),
            "left",
        )
    )
    return tagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_fact"),
        F.sum(F.when(F.col("__pass"), 1).otherwise(0))
        .cast("long").alias("n_pass"),
        F.sum(F.when(F.col("__m").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_match"),
        F.sum(
            F.when(F.col("__pass") & F.col("__m").isNull(), 1).otherwise(0)
        ).cast("long").alias("n_false_pos"),
    ).select(
        "n_fact", "n_pass", "n_match", "n_false_pos",
        F.expr(
            "n_false_pos * 1000000 DIV nullif(n_fact - n_match, 0)"
        ).alias("fp_rate_ppm"),
    )
