"""Post-training (SFT / preference) data-curation operators — the
round-14 capability wave: the registry's pretraining families (dedup,
quality, packing) get their multi-turn and preference-pair analogs.

The unit of post-training data is a CONVERSATION (ordered turns with
roles), not a document, and that changes the shape of every standard
curation op:

* dedup keys on individual ASSISTANT turns (the trained tokens) — a
  boilerplate reply duplicated across thousands of conversations is
  the SFT analog of a repeated pretraining passage;
* packing must keep conversations ATOMIC (a split conversation loses
  its dialogue structure), so greedy bin packing replaces GPT-style
  concat-and-chunk (:func:`..text.pack_sequences`), and the token
  budget decomposes into total vs trainable (loss-bearing role) parts;
* preference pairs carry their own pathology metrics — reward margin
  and verbosity bias — that gate what feeds Bradley-Terry / Elo
  (:mod:`..stats`).

House determinism contract throughout: md5 fingerprints, exact
integer sums for every mean (quantized BIGINT, one correctly-rounded
division at the end), round-6 doubles, no RNG.

Reference tie: the reference's closed DSL (README.md:320-344) has no
conversation surface; these extend the SURVEY.md §2.16 LLM additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_Q = 1_000_000


def conversation_turn_dedup(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """Exact duplicate-turn detection across conversations — the
    multi-turn analog of document fingerprint dedup
    (:func:`..dedup.exact_duplicates`): turns whose role is in
    ``roles`` (default: assistant, the loss-bearing side) are keyed by
    the md5 of their text; within each fingerprint group the FIRST
    occurrence in (conv, turn) order is canonical and every later
    occurrence is emitted as a duplicate, pointing at its canonical
    turn.  Templated/boilerplate replies repeated across an SFT corpus
    are exactly what this surfaces — training on them over-weights the
    template (the Lee et al. 2022 dedup argument, turn-granular).

    Scale shape: ONE shuffle on the fingerprint (the group window);
    output is only the duplicate turns.  NULL texts are excluded
    (fingerprint undefined).  Returns
    (conv_id, turn_idx, role, fingerprint, canon_conv, canon_turn,
    n_copies) ordered by (conv_id, turn_idx) — ``n_copies`` is the
    fingerprint group's total occurrence count.
    """
    base = turns.where(
        F.col(text_col).isNotNull()
        & F.col(role_col).isin(*roles)
    ).select(
        F.col(conv_col).cast("long").alias("conv_id"),
        F.col(turn_col).cast("long").alias("turn_idx"),
        F.col(role_col).cast("string").alias("role"),
        F.md5(F.col(text_col)).alias("fingerprint"),
    )
    w = Window.partitionBy("fingerprint").orderBy(
        F.col("conv_id").asc(), F.col("turn_idx").asc())
    wall = Window.partitionBy("fingerprint")
    ranked = base.select(
        "conv_id", "turn_idx", "role", "fingerprint",
        F.row_number().over(w).alias("__rn"),
        F.first("conv_id").over(w).alias("canon_conv"),
        F.first("turn_idx").over(w).alias("canon_turn"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n_copies"),
    )
    return ranked.where("__rn > 1").select(
        "conv_id", "turn_idx", "role", "fingerprint",
        F.col("canon_conv").cast("long").alias("canon_conv"),
        F.col("canon_turn").cast("long").alias("canon_turn"),
        "n_copies",
    ).orderBy("conv_id", "turn_idx")


def pack_conversations(
    turns: DataFrame,
    budget_tokens: int = 1024,
    n_shards: int = 32,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    loss_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """Role-aware ATOMIC sequence packing for SFT corpora — the
    conversation analog of :func:`..text.pack_sequences`: conversations
    are never split across bins (a split conversation loses its
    dialogue structure), so each shard packs its conversations
    greedily in ``conv_col`` order — a bin closes when the next
    conversation would push it past ``budget_tokens`` (a conversation
    larger than the budget gets a bin of its own).  Per conversation
    the token budget decomposes into total tokens (context the model
    reads) and TRAINABLE tokens (turns whose role is in
    ``loss_roles`` — the tokens the loss actually touches), the
    utilization number an SFT run plans around.

    Scale shape: one aggregation shuffles turns to per-conversation
    rows; the inherently SEQUENTIAL greedy scan then runs per shard —
    ``n_shards`` independent Arrow ``applyInPandas`` groups, exactly
    how packing jobs shard in practice (each shard feeds its own
    writer; sizing n_shards to the cluster keeps every group bounded
    at n_convs/n_shards rows).  No driver-side state; the DuckDB twin
    replays the same greedy recurrence as a recursive CTE.

    Returns (conv_id, shard, n_turns, n_tokens, n_trainable_tokens,
    bin) ordered by conv_id — ``bin`` is shard-local.
    """
    import pandas as pd

    budget = int(budget_tokens)
    if budget < 1:
        raise ValueError("budget_tokens must be >= 1")
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    trainable = F.when(
        F.col(role_col).isin(*loss_roles), n_tok
    ).otherwise(F.lit(0)).cast("long")
    per_conv = turns.where(F.col(text_col).isNotNull()).groupBy(
        F.col(conv_col).cast("long").alias("conv_id")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(n_tok).cast("long").alias("n_tokens"),
        F.sum(trainable).cast("long").alias("n_trainable_tokens"),
    ).withColumn(
        "shard", (F.col("conv_id") % n_shards).cast("long"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("conv_id").reset_index(drop=True)
        bins, bin_i, running = [], 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if running > 0 and running + t > budget:
                bin_i += 1
                running = 0
            bins.append(bin_i)
            running += t
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf

    out_schema = (
        "conv_id long, n_turns long, n_tokens long, "
        "n_trainable_tokens long, shard long, bin long"
    )
    return per_conv.groupBy("shard").applyInPandas(
        pack, schema=out_schema
    ).select(
        "conv_id", "shard", "n_turns", "n_tokens",
        "n_trainable_tokens", "bin",
    ).orderBy("conv_id")


def preference_pair_report(
    pairs: DataFrame,
    domain_col: str = "domain",
    chosen_tokens_col: str = "chosen_tokens",
    rejected_tokens_col: str = "rejected_tokens",
    chosen_reward_col: str = "chosen_reward",
    rejected_reward_col: str = "rejected_reward",
) -> DataFrame:
    """Per-domain health report for preference-pair (RLHF/DPO) data —
    the gate BEFORE the pairs feed :func:`..stats.bradley_terry` /
    :func:`..stats.elo_preference_ratings`: reward margins and length
    (verbosity) bias per domain.  A domain whose chosen responses are
    systematically longer trains a verbosity prior, not a quality
    prior (the classic RLHF length-bias failure); a domain with
    near-zero or negative margins is label noise.

    All means are exact integer arithmetic: rewards are quantized to
    micro-units (``round(x * 1e6)`` BIGINT) and token counts are
    already integers, so every sum is order-independent and each mean
    is ONE correctly-rounded division (round-6, house contract).
    One scan, one map-side-combined aggregation — scan-bound at any
    scale.  NULL in any graded column drops the pair (both engines).

    Returns one row per domain ordered by domain:
    (domain, n_pairs, mean_margin, frac_margin_nonpos,
    mean_chosen_tokens, mean_rejected_tokens, frac_chosen_longer).
    """
    return _preference_pair_agg(
        pairs, domain_col, chosen_tokens_col, rejected_tokens_col,
        chosen_reward_col, rejected_reward_col,
    ).orderBy("domain")


def _preference_pair_agg(
    pairs: DataFrame,
    domain_col: str,
    chosen_tokens_col: str,
    rejected_tokens_col: str,
    chosen_reward_col: str,
    rejected_reward_col: str,
) -> DataFrame:
    """Unordered report core shared by the batch operator and the
    streaming twin (``streaming.windows.prefs_margin_stream``): every
    mean is recomputed per emission from exact integer running sums
    (quantized margins, BIGINT token counts), so in an update-mode
    stream each domain's latest emission equals the batch report over
    everything ingested; sorting is the only batch-side extra."""
    qc = f"CAST(round(({chosen_reward_col}) * {_Q}.0d) AS BIGINT)"
    qr = f"CAST(round(({rejected_reward_col}) * {_Q}.0d) AS BIGINT)"
    base = pairs.where(
        " AND ".join(
            f"({c}) IS NOT NULL"
            for c in (domain_col, chosen_tokens_col, rejected_tokens_col,
                      chosen_reward_col, rejected_reward_col)
        )
    ).select(
        F.col(domain_col).cast("string").alias("domain"),
        F.expr(f"{qc} - {qr}").alias("__m"),
        F.expr(f"CAST({chosen_tokens_col} AS BIGINT)").alias("__ct"),
        F.expr(f"CAST({rejected_tokens_col} AS BIGINT)").alias("__rt"),
    )
    n = F.count(F.lit(1)).cast("long")
    return base.groupBy("domain").agg(
        n.alias("n_pairs"),
        F.expr(
            f"round((CAST(sum(__m) AS DOUBLE) / {_Q}.0d) "
            "/ CAST(count(1) AS DOUBLE), 6)"
        ).alias("mean_margin"),
        F.expr(
            "round(CAST(sum(CASE WHEN __m <= 0 THEN 1 ELSE 0 END) "
            "AS DOUBLE) / CAST(count(1) AS DOUBLE), 6)"
        ).alias("frac_margin_nonpos"),
        F.expr(
            "round(CAST(sum(__ct) AS DOUBLE) "
            "/ CAST(count(1) AS DOUBLE), 6)"
        ).alias("mean_chosen_tokens"),
        F.expr(
            "round(CAST(sum(__rt) AS DOUBLE) "
            "/ CAST(count(1) AS DOUBLE), 6)"
        ).alias("mean_rejected_tokens"),
        F.expr(
            "round(CAST(sum(CASE WHEN __ct > __rt THEN 1 ELSE 0 END) "
            "AS DOUBLE) / CAST(count(1) AS DOUBLE), 6)"
        ).alias("frac_chosen_longer"),
    )


def best_of_n_selection(
    candidates: DataFrame,
    prompt_col: str = "prompt_id",
    candidate_col: str = "candidate_id",
    reward_col: str = "reward",
    tokens_col: str | None = None,
) -> DataFrame:
    """Rejection-sampling (best-of-n) selection — the reducer that
    turns n sampled completions per prompt into the one kept for SFT
    (the RLHF "rejection sampling" / RAFT data-generation step): per
    prompt the highest-reward candidate wins, ties break on the
    smallest candidate id (deterministic, no RNG), and the row carries
    the selection-quality evidence a curator filters on — the margin
    over the runner-up (``reward_gap``: a near-zero gap means the
    reward model could not separate the candidates, the pairs a human
    should re-check) and the candidate count actually sampled.

    ONE window shuffle keyed on the prompt (rank + runner-up lookup in
    the same pass), output is one row per prompt — at 10^9 prompts
    this is a single hash-partitioned pass, no driver state.  Rewards
    pass through exactly (max/lead of stored doubles); only the
    derived gap is round-6 (house contract).  NULL rewards are
    excluded before ranking (an unscored candidate can neither win nor
    be the runner-up).

    Returns (prompt_id, best_candidate, best_reward, second_reward,
    reward_gap, n_candidates[, best_tokens]) ordered by prompt_id —
    ``second_reward``/``reward_gap`` are NULL for single-candidate
    prompts.
    """
    cols = [
        F.col(prompt_col).cast("long").alias("prompt_id"),
        F.col(candidate_col).cast("long").alias("cand"),
        F.col(reward_col).cast("double").alias("r"),
    ]
    if tokens_col is not None:
        cols.append(F.expr(f"CAST({tokens_col} AS BIGINT)").alias("tok"))
    base = candidates.where(
        f"({prompt_col}) IS NOT NULL AND ({candidate_col}) IS NOT NULL "
        f"AND ({reward_col}) IS NOT NULL"
    ).select(*cols)
    w = Window.partitionBy("prompt_id").orderBy(
        F.col("r").desc(), F.col("cand").asc())
    wall = Window.partitionBy("prompt_id")
    ranked = base.select(
        "prompt_id",
        F.row_number().over(w).alias("__rn"),
        F.col("cand").alias("best_candidate"),
        F.col("r").alias("best_reward"),
        F.lead("r").over(w).alias("second_reward"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n_candidates"),
        *([F.col("tok").alias("best_tokens")]
          if tokens_col is not None else []),
    )
    out = ranked.where("__rn = 1").drop("__rn").withColumn(
        "reward_gap",
        F.expr("round(best_reward - second_reward, 6)"))
    keep = ["prompt_id", "best_candidate", "best_reward",
            "second_reward", "reward_gap", "n_candidates"]
    if tokens_col is not None:
        keep.append("best_tokens")
    return out.select(*keep).orderBy("prompt_id")
