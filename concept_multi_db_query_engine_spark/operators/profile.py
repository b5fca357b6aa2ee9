"""Table profiling: per-column null counts, exact distinct cardinalities,
and min/max ranges in one union-of-aggregates plan — the "what is in this
table" first query of any data-engineering engagement.

Reference behavior source: the spec's meta/debug execute modes expose
schema-level metadata only (EXECUTION_MODES.md); column-level profiling is
part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "integer", "bigint", "long",
            "float", "double"}


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True,
) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_null, n_distinct,
    min_num, max_num, min_str, max_str). Numeric columns fill the ``_num``
    pair (cast to double); string columns the lexicographic ``_str`` pair;
    other types profile nulls/distincts only. ``n_distinct`` is exact and
    excludes NULL (both engines' ``count(DISTINCT c)`` semantics).

    Plan shape: one single-row aggregate per column, unioned. With columnar
    sources each branch's scan prunes to that one column, so the union of
    k branches reads ~the same bytes as one k-column scan while keeping
    every aggregate map-side combined — no Expand-based multi-distinct
    blow-up (which would multiply the shuffle by k). Exact distincts
    shuffle one value-keyed row per distinct value per column; swap in
    ``approx_count_distinct`` upstream if a 100 TB profile only needs
    cardinality estimates.

    ``exact=False`` swaps the distinct counts for ``approx_count_distinct``
    (HLL++, 1% rsd) — the 100 TB profile: every aggregate becomes a
    fixed-size mergeable sketch, so the per-branch shuffle carries one
    register set per partition instead of one row per distinct value.
    """
    types = dict(df.dtypes)
    cols = columns if columns is not None else df.columns
    branches = []
    for c in cols:
        t = types[c]
        is_num = t in _NUMERIC or t.startswith("decimal")
        is_str = t == "string"
        branches.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
                (F.countDistinct(c) if exact
                 else F.approx_count_distinct(c, 0.01))
                .alias("n_distinct"),
                (F.min(c).cast("double") if is_num
                 else F.lit(None).cast("double")).alias("min_num"),
                (F.max(c).cast("double") if is_num
                 else F.lit(None).cast("double")).alias("max_num"),
                (F.min(c) if is_str
                 else F.lit(None).cast("string")).alias("min_str"),
                (F.max(c) if is_str
                 else F.lit(None).cast("string")).alias("max_str"),
            ).select(F.lit(c).alias("col_name"), "*")
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns: the
    size of every equivalence class (rows sharing all quasi values) and
    whether it violates the k threshold — the data-governance companion
    to the masking/ACL surface (a masked export is only private if no
    quasi-identifier combination isolates fewer than k individuals;
    Sweeney 2002).

    ONE hash aggregation on the quasi tuple (map-side combined counts —
    the same shape as any GROUP BY, skew handled by AQE); no windows,
    no driver state. At 100 TB the class count is bounded by the quasi
    domain product, not the row count. Returns one row per equivalence
    class: (*quasi_cols, class_size, at_risk).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
        .withColumn("at_risk", F.col("class_size") < F.lit(k))
    )


def benford_report(
    df: DataFrame, value_col: str, int_scale: int = 100,
) -> DataFrame:
    """Benford's-law first-digit audit: the observed first-significant-
    digit distribution of a positive amount column against the Benford
    expectation ``p(d) = log10(1 + 1/d)``, plus the chi-square distance
    — the classic fabricated-/synthetic-amounts smell test run over
    financial columns before trusting them as training signal (Benford
    1938; Nigrini 1996 fraud auditing).

    Determinism: the value is quantized to an exact BIGINT at
    ``int_scale`` (cents for money) and the first digit is taken from
    the INTEGER's decimal string — integer-to-string is unambiguous on
    every engine, unlike float formatting or ``log10`` bucketing.
    Expected shares quantize ``ln``-ratios to integer micros (safe
    margins: no digit lands near a .5 boundary) and the chi-square
    terms re-quantize before the final sum, so the statistic is
    cross-engine bit-stable.

    Plan shape: ONE scan → a 9-group hash aggregate (map-side
    combined); everything after runs on the 9-row digit frame (spine
    join against ``sequence(1, 9)`` so zero-count digits still report,
    unpartitioned windows for totals — model data, never the corpus).

    Returns 9 rows: (digit, n_obs, obs_share, exp_share, chi2_micro,
    chi2) — chi2 columns repeat the table-level statistic per row.
    """
    if int_scale < 1:
        raise ValueError("int_scale must be >= 1")
    from pyspark.sql import Window

    obs = (
        df.select(
            F.expr(
                f"CAST(round(CAST(({value_col}) AS DOUBLE) "
                f"* {int_scale}.0d) AS BIGINT)"
            ).alias("__x")
        )
        .where("__x IS NOT NULL AND __x > 0")
        .select(
            F.expr(
                "CAST(substring(CAST(__x AS STRING), 1, 1) AS INT)"
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = (
        spine.join(obs, "digit", "left")
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("long")
            .alias("n_obs"),
            F.expr(
                "CAST(round(ln(1.0d + 1.0d / CAST(digit AS DOUBLE)) "
                "/ ln(10.0d) * 1000000.0d) AS BIGINT)"
            ).alias("__exp_micro"),
        )
        .withColumn("__n", F.sum("n_obs").over(w))
        .withColumn(
            "__term_micro",
            # squared diff via explicit multiplication: pow(x, 2) is not
            # guaranteed bit-identical across libm implementations
            F.expr(
                "CAST(round((CAST(n_obs AS DOUBLE) - CAST(__n AS DOUBLE) "
                "* (CAST(__exp_micro AS DOUBLE) / 1000000.0d)) "
                "* (CAST(n_obs AS DOUBLE) - CAST(__n AS DOUBLE) "
                "* (CAST(__exp_micro AS DOUBLE) / 1000000.0d)) "
                "/ nullif(CAST(__n AS DOUBLE) "
                "* (CAST(__exp_micro AS DOUBLE) / 1000000.0d), 0.0d) "
                "* 1000000.0d) AS BIGINT)"
            ),
        )
        .withColumn("__chi2_micro", F.sum("__term_micro").over(w))
    )
    return staged.select(
        "digit",
        "n_obs",
        F.expr(
            "round(CAST(n_obs AS DOUBLE) "
            "/ nullif(CAST(__n AS DOUBLE), 0.0d), 6)"
        ).alias("obs_share"),
        (F.col("__exp_micro").cast("double") / 1e6).alias("exp_share"),
        F.col("__chi2_micro").alias("chi2_micro"),
        (F.col("__chi2_micro").cast("double") / 1e6).alias("chi2"),
    ).orderBy("digit")


def expectations_report(
    df: DataFrame,
    row_checks: dict[str, str],
    unique_keys: dict[str, list[str]] | None = None,
    fks: dict[str, tuple[list[str], DataFrame, list[str]]] | None = None,
) -> DataFrame:
    """Data-quality expectation suite (the Great-Expectations pattern
    as a single report): declarative checks over a table, each
    answered with an exact violation count —

    - ``row_checks``: name → boolean SQL expr that is TRUE for VALID
      rows (NULL counts as a violation — unknown is not valid);
    - ``unique_keys``: name → column list that must be unique;
    - ``fks``: name → (cols, ref_df, ref_cols) referential checks
      (rows whose non-null key has no match in the reference).

    Plan shape: ALL row checks ride ONE conditional aggregation scan;
    each uniqueness check is one keyed aggregate (duplicates =
    Σ(count−1) over classes, so the violation count is "rows that
    would have to be dropped"); each FK is one LEFT ANTI join counted.
    Everything is exact integers — the report is engine- and
    partitioning-independent.

    Returns one row per check: (check, kind, n_rows, n_violations,
    passed), ordered by check.
    """
    if not row_checks and not unique_keys and not fks:
        raise ValueError("no checks given")
    parts = []
    if row_checks:
        aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
        for name, expr in row_checks.items():
            aggs.append(
                F.expr(
                    f"CAST(sum(CASE WHEN coalesce(CAST(({expr}) AS "
                    "BOOLEAN), false) THEN 0 ELSE 1 END) AS BIGINT)"
                ).alias(f"__v_{len(parts) + len(aggs)}")
            )
        one = df.agg(*aggs)
        for i, name in enumerate(row_checks):
            col = one.columns[i + 1]
            parts.append(one.select(
                F.lit(name).alias("check"),
                F.lit("row").alias("kind"),
                F.col("__n").alias("n_rows"),
                F.col(col).alias("n_violations"),
            ))
    for name, cols in (unique_keys or {}).items():
        g = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c"))
        parts.append(g.agg(
            F.coalesce(F.sum("__c"), F.lit(0)).cast("long")
            .alias("n_rows"),
            F.coalesce(F.sum(F.col("__c") - 1), F.lit(0)).cast("long")
            .alias("n_violations"),
        ).select(
            F.lit(name).alias("check"), F.lit("unique").alias("kind"),
            "n_rows", "n_violations",
        ))
    for name, (cols, ref, ref_cols) in (fks or {}).items():
        keyed = df.where(
            " AND ".join(f"({c}) IS NOT NULL" for c in cols)
        ).select(*[F.expr(c).alias(f"__k{i}")
                   for i, c in enumerate(cols)])
        rhs = ref.select(*[F.expr(c).alias(f"__k{i}")
                           for i, c in enumerate(ref_cols)]).distinct()
        cond = [f"__k{i}" for i in range(len(cols))]
        orphans = keyed.join(rhs, cond, "left_anti")
        parts.append(
            keyed.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            .crossJoin(
                orphans.agg(F.count(F.lit(1)).cast("long")
                            .alias("n_violations")))
            .select(
                F.lit(name).alias("check"), F.lit("fk").alias("kind"),
                "n_rows", "n_violations",
            ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "passed", F.col("n_violations") == 0
    ).orderBy("check")


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the
    k-anonymity upgrade: a class of k rows is still unsafe if they all
    share ONE sensitive value (the homogeneity attack k-anonymity
    misses), so each quasi-identifier equivalence class must contain
    at least ``l`` DISTINCT sensitive values.

    ONE hash aggregation on the quasi tuple computing the class size
    and the exact distinct-sensitive count (a single count-distinct —
    Catalyst expands it to one extra keyed pass, still bounded by the
    quasi×sensitive domain, never the corpus).  Returns one row per
    class: (*quasi_cols, class_size, n_sensitive, at_risk).
    """
    if l < 2:
        raise ValueError("l must be >= 2")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("class_size"),
            F.countDistinct(sensitive_col).cast("long")
            .alias("n_sensitive"),
        )
        .withColumn("at_risk", F.col("n_sensitive") < F.lit(l))
    )


def diversity_report(
    df: DataFrame, group_col: str, cat_col: str,
) -> DataFrame:
    """Categorical diversity per group — the corpus-mix dashboard row:
    Shannon entropy (plus its exp, the "effective number of
    categories"), normalized entropy (H / ln k), and the unbiased
    Gini–Simpson index ``1 − Σ n_c(n_c−1) / (n(n−1))`` — read before
    training to see whether a source actually mixes languages/domains
    or just claims to (effective_cats ≈ 1 means monoculture no matter
    how many labels appear).

    ONE scan to (group, category) counts; per-category entropy terms
    quantize ``p·ln p`` to integer nanos before the group sum (the
    libm discipline), Simpson is exact integer arithmetic converted
    once.  Returns one row per group: (group, n, k, entropy,
    norm_entropy, effective_cats, simpson), ordered by group.
    """
    from pyspark.sql import Window

    cnt = (
        df.where(f"({group_col}) IS NOT NULL AND ({cat_col}) IS NOT NULL")
        .groupBy(
            F.expr(f"CAST(({group_col}) AS STRING)").alias("group"),
            F.expr(f"CAST(({cat_col}) AS STRING)").alias("__c"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w_g = Window.partitionBy("group").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = cnt.withColumn(
        "__n", F.sum("cnt").over(w_g).cast("long")
    ).withColumn(
        "__h_nano",
        F.expr(
            "CAST(round(0.0 - (CAST(cnt AS DOUBLE) / CAST(__n AS DOUBLE))"
            " * ln(CAST(cnt AS DOUBLE) / CAST(__n AS DOUBLE)) "
            "* 1000000000.0) AS BIGINT)"
        ),
    ).withColumn(
        "__sp_num",
        F.expr("CAST(cnt AS DECIMAL(38,0)) * CAST(cnt - 1 AS BIGINT)"),
    )
    g = staged.groupBy("group").agg(
        F.max("__n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__h_nano").cast("long").alias("__h"),
        F.expr("CAST(sum(__sp_num) AS DECIMAL(38,0))").alias("__spn"),
    )
    h = "(CAST(__h AS DOUBLE) / 1000000000.0)"
    return g.select(
        "group", "n", "k",
        F.expr(f"CAST(round({h} * 1000000.0) AS BIGINT) / 1e6")
        .cast("double").alias("entropy"),
        F.expr(
            f"CAST(round({h} / nullif(ln(CAST(k AS DOUBLE)), 0.0) "
            "* 1000000.0) AS BIGINT) / 1e6"
        ).cast("double").alias("norm_entropy"),
        F.expr(
            f"CAST(round(exp({h}) * 1000000.0) AS BIGINT) / 1e6"
        ).cast("double").alias("effective_cats"),
        F.expr(
            "CAST(round((1.0 - CAST(__spn AS DOUBLE) "
            "/ nullif(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0), "
            "0.0)) * 1000000.0) AS BIGINT) / 1e6"
        ).cast("double").alias("simpson"),
    ).orderBy("group")


def functional_dependency(
    df: DataFrame, det_cols: list[str], dep_col: str,
) -> DataFrame:
    """Approximate functional-dependency check ``det_cols → dep_col``
    (Huhtala et al.'s TANE measure, aggregate form): how close the
    data comes to "the determinant columns uniquely fix the dependent
    column" — the schema-discovery / denormalization-audit question
    (is ZIP → city actually clean? did the merge duplicate variants?).

    ``g3`` strength = 1 − (minimum rows to delete for the FD to hold)
    / n, where per determinant group the rows to delete are all but
    the most frequent dependent value.  TWO hash aggregates, both on
    bounded frames: (det, dep) counts, then a per-det max/sum rollup —
    exact integers end to end.

    Returns one row: (n_rows, n_groups, n_violating_groups,
    n_violating_rows, fd_strength) — strength 1.0 means the FD holds
    exactly.
    """
    if not det_cols:
        raise ValueError("det_cols must be non-empty")
    pair = (
        df.where(f"({dep_col}) IS NOT NULL")
        .groupBy(*det_cols, dep_col)
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    per_det = pair.groupBy(*det_cols).agg(
        F.sum("__c").cast("long").alias("__n"),
        F.max("__c").cast("long").alias("__keep"),
        F.count(F.lit(1)).cast("long").alias("__vals"),
    )
    return per_det.agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.expr("CASE WHEN __vals > 1 THEN 1 ELSE 0 END"))
        .cast("long").alias("n_violating_groups"),
        F.sum(F.expr("__n - __keep")).cast("long")
        .alias("n_violating_rows"),
    ).select(
        "n_rows", "n_groups", "n_violating_groups", "n_violating_rows",
        F.expr(
            "CAST(round((1.0 - CAST(n_violating_rows AS DOUBLE) "
            "/ nullif(CAST(n_rows AS DOUBLE), 0.0)) * 1000000.0) "
            "AS BIGINT) / 1e6"
        ).cast("double").alias("fd_strength"),
    )


def inclusion_dependency(
    df_a: DataFrame, col_a: str,
    df_b: DataFrame, col_b: str,
    name: str = "a_in_b",
) -> DataFrame:
    """Inclusion-dependency measure ``A ⊆ B`` — the foreign-key
    DISCOVERY complement to :func:`expectations_report`'s FK check
    (which assumes you already know the key): what fraction of A's
    distinct non-null values appear in B.  Containment ~1 flags a
    candidate FK; the direction with higher containment points at the
    referenced side.

    Distinct both sides (value-keyed aggregates), ONE left-semi join
    for the matched count — never a row-level join of the raw tables.
    Returns one row: (dep, n_distinct_a, n_matched, containment).
    """
    a = df_a.where(f"({col_a}) IS NOT NULL").select(
        F.expr(f"CAST(({col_a}) AS STRING)").alias("__v")).distinct()
    b = df_b.where(f"({col_b}) IS NOT NULL").select(
        F.expr(f"CAST(({col_b}) AS STRING)").alias("__v")).distinct()
    matched = a.join(b, "__v", "left_semi")
    return (
        a.agg(F.count(F.lit(1)).cast("long").alias("n_distinct_a"))
        .crossJoin(
            matched.agg(F.count(F.lit(1)).cast("long")
                        .alias("n_matched")))
        .select(
            F.lit(name).alias("dep"),
            "n_distinct_a", "n_matched",
            F.expr(
                "CAST(round(CAST(n_matched AS DOUBLE) "
                "/ nullif(CAST(n_distinct_a AS DOUBLE), 0.0) "
                "* 1000000.0) AS BIGINT) / 1e6"
            ).cast("double").alias("containment"),
        )
    )


def expectation_failures_sample(
    df: DataFrame,
    row_checks: dict[str, str],
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Show-me-examples companion to :func:`expectations_report`: for
    each named row check, the first ``k`` VIOLATING row ids (by id
    order) — the quarantine sample an on-call engineer opens first,
    because a violation count without examples is a ticket nobody can
    act on.

    ONE scan: each row emits a flag per check through an exploded
    check array (bounded ×|checks|, evaluated inline — no per-check
    passes), violations rank per check by id, top-``k`` kept.
    Returns (check, id, sample_rank), ordered by (check, sample_rank).
    """
    from pyspark.sql import Window

    if not row_checks or k < 1:
        raise ValueError("row_checks must be non-empty and k >= 1")
    arms = ", ".join(
        f"named_struct('check', '{name}', 'bad', "
        f"NOT coalesce(CAST(({expr}) AS BOOLEAN), false))"
        for name, expr in row_checks.items()
    )
    exploded = df.select(
        F.expr(f"({id_col})").alias("id"),
        F.explode(F.expr(f"array({arms})")).alias("__c"),
    ).where("__c.bad").select("id", F.expr("__c.check").alias("check"))
    w = Window.partitionBy("check").orderBy(F.col("id").asc())
    return (
        exploded.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
        .select("check", "id", "sample_rank")
        .orderBy("check", "sample_rank")
    )
