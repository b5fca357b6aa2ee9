"""DataFrame builder: ResolvedPlan → lazy Spark DataFrame.

This is the analog of the reference's SQL generators (SQL_DIALECTS.md:250-258)
— except the "dialect" is the Catalyst logical plan. Everything physical
(join algorithm selection, predicate pushdown, column pruning, codegen, AQE)
is delegated to Catalyst; this module only declares the logical plan:

- 31 filter operators → built-in Column expressions (JVM-side, codegen'd;
  no Python UDFs anywhere in the query path).
- EXISTS / counted EXISTS → the *decorrelated* form the reference uses for
  ClickHouse/Trino (CROSS_DB_NORMALIZATION.md:14-44): groupBy(fk).count() +
  join. Plain EXISTS in top-level AND position takes the semi/anti-join fast
  path; EXISTS inside OR/NOT groups (contract C603) is materialized as a
  boolean flag column so it composes with any boolean structure.
- Masking → Column expressions applied in the final projection, so masked
  queries never move raw values to the driver.
"""

from __future__ import annotations

import functools
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .masking import mask_column
from .plans import (
    ColumnFilter,
    ExistsPlan,
    FilterTree,
    GroupNode,
    HavingFilter,
    ResolvedPlan,
    ValueFilter,
    walk_exists,
)
from .sources import SourceRegistry


class DataFrameBuilder:
    def __init__(self, spark: SparkSession, registry: SourceRegistry):
        self.spark = spark
        self.registry = registry

    # -- public ---------------------------------------------------------------

    def build(self, plan: ResolvedPlan) -> DataFrame:
        """Full result frame: joins → exists flags → where → group/agg →
        having → projection(+masking) → distinct → order → offset/limit."""
        base = self._relation(plan)

        if plan.aggregations:
            return self._aggregate(base, plan)

        if plan.group_by and not plan.aggregations:
            # groupBy without aggregations ≡ SELECT DISTINCT of the group keys
            exprs = []
            seen: set[str] = set()
            for s in plan.group_by:
                if s.out_name in seen:
                    continue
                seen.add(s.out_name)
                exprs.append(F.col(f"{s.table_alias}.{s.physical}").alias(s.out_name))
            frame = base.select(*exprs).distinct()
            return self._order_limit(frame, plan, output_names_only=True)

        if plan.distinct:
            frame = base.select(*self._projection(plan))
            frame = frame.distinct()
            frame = self._order_limit(frame, plan, output_names_only=True)
            return frame

        frame = self._order_limit(base, plan, output_names_only=False)
        return frame.select(*self._projection(plan))

    def build_count(self, plan: ResolvedPlan) -> int:
        """Count mode (QUERY.md:193): filters + joins stay active; columns/
        orderBy/limit/offset/groupBy/aggregations/having are ignored. A
        `distinct: true` + explicit columns query counts distinct values
        (contract C1713)."""
        base = self._relation(plan)
        if plan.distinct and plan.select_items:
            proj = [
                F.col(f"{s.table_alias}.{s.physical}").alias(s.out_name)
                for s in plan.select_items
            ]
            return base.select(*proj).distinct().count()
        return base.count()

    # -- relation: from + joins + exists + where --------------------------------

    def _relation(self, plan: ResolvedPlan) -> DataFrame:
        frame = self._table(plan.from_database, plan.from_physical, plan.from_alias)
        for j in plan.joins:
            right = self._table(j.database, j.physical_name, j.alias)
            cond = F.col(f"{j.left_alias}.{j.left_physical}") == F.col(
                f"{j.alias}.{j.right_physical}"
            )
            frame = frame.join(right, cond, j.join_type)

        # classify EXISTS nodes: direct children of the top-level AND with no
        # count take the semi/anti fast path (single join, no flag column)
        fast: set[str] = set()
        if plan.where is not None:
            for c in plan.where.conditions:
                if isinstance(c, ExistsPlan) and c.count_op is None:
                    fast.add(c.flag_name)

        for ep in plan.exists_flags:
            if ep.flag_name in fast:
                frame = self._exists_semi_join(frame, ep)
            else:
                frame = self._exists_flag(frame, ep)

        if plan.where is not None:
            cond = self._tree(plan.where, skip_flags=fast)
            if cond is not None:
                frame = frame.filter(cond)
        return frame

    def _table(self, database: str, physical: str, alias: str) -> DataFrame:
        return self.registry.df(self.spark, database, physical).alias(alias)

    # -- EXISTS -----------------------------------------------------------------

    def _exists_child(self, ep: ExistsPlan) -> DataFrame:
        """The filtered child table, with its own nested EXISTS compiled
        recursively (README.md:282: nested EXISTS resolves against the outer
        EXISTS's table)."""
        child = self._table(ep.database, ep.physical_name, ep.alias)
        nested: list[ExistsPlan] = []
        walk_exists(ep.where, nested)
        fast: set[str] = set()
        if ep.where is not None:
            for c in ep.where.conditions:
                if isinstance(c, ExistsPlan) and c.count_op is None:
                    fast.add(c.flag_name)
        for nep in nested:
            if nep.flag_name in fast:
                child = self._exists_semi_join(child, nep)
            else:
                child = self._exists_flag(child, nep)
        if ep.where is not None:
            cond = self._tree(ep.where, skip_flags=fast)
            if cond is not None:
                child = child.filter(cond)
        return child

    def _exists_semi_join(self, outer: DataFrame, ep: ExistsPlan) -> DataFrame:
        """Plain EXISTS/NOT EXISTS in AND position → left_semi/left_anti
        against the child's correlation keys. Catalyst broadcasts the child
        side when small; no flag column, no extra projection."""
        child = self._exists_child(ep)
        keys = child.select(
            F.col(f"{ep.alias}.{ep.child_physical}").alias(f"{ep.flag_name}_k")
        )
        cond = F.col(f"{ep.outer_alias}.{ep.outer_physical}") == F.col(
            f"{ep.flag_name}_k"
        )
        how = "left_anti" if ep.negated else "left_semi"
        return outer.join(keys, cond, how)

    def _exists_flag(self, outer: DataFrame, ep: ExistsPlan) -> DataFrame:
        """General form: materialize a boolean flag via the decorrelated
        groupBy(correlation_key).count() + left join (the normalization the
        reference applies for ClickHouse/Trino — CROSS_DB_NORMALIZATION.md:
        14-44). Handles counted variants including `<`/`<=` with zero-child
        parents (coalesce(cnt, 0) keeps parents with no children)."""
        child = self._exists_child(ep)
        kcol = f"{ep.flag_name}_k"
        ccol = f"{ep.flag_name}_c"
        grouped = child.groupBy(
            F.col(f"{ep.alias}.{ep.child_physical}").alias(kcol)
        ).agg(F.count(F.lit(1)).alias(ccol))
        cond = F.col(f"{ep.outer_alias}.{ep.outer_physical}") == F.col(kcol)
        joined = outer.join(grouped, cond, "left")
        cnt = F.coalesce(F.col(ccol), F.lit(0))
        if ep.count_op is not None:
            flag = _compare(cnt, ep.count_op, F.lit(ep.count_value))
        elif ep.negated:
            flag = cnt == 0
        else:
            flag = cnt > 0
        return joined.withColumn(ep.flag_name, flag).drop(kcol, ccol)

    # -- aggregation ------------------------------------------------------------

    def _aggregate(self, base: DataFrame, plan: ResolvedPlan) -> DataFrame:
        group_exprs = []
        seen: set[str] = set()
        for s in plan.group_by:
            if s.out_name in seen:
                continue
            seen.add(s.out_name)
            group_exprs.append(
                F.col(f"{s.table_alias}.{s.physical}").alias(s.out_name)
            )
        agg_exprs = []
        for a in plan.aggregations:
            if a.physical is None:
                agg_exprs.append(F.count(F.lit(1)).alias(a.alias))
                continue
            col = F.col(f"{a.table_alias}.{a.physical}")
            if a.fn == "avg":
                # avg result type is 'decimal' per the spec (QUERY.md:173);
                # compute sum over a decimal-cast column so the parallel
                # partial aggregation is exact and associative (matches any
                # sequential engine bit-for-bit), then one deterministic
                # double division per group. F.avg(int) would divide in
                # engine-specific order and diverge at the ulp level.
                # decimal(28,10) covers the declared 'decimal' scale (10)
                # exactly — no per-element rounding — with 18 integer digits;
                # Spark widens the sum itself to decimal(38,10).
                agg_exprs.append(
                    (F.sum(col.cast("decimal(28,10)")).cast("double")
                     / F.count(col)).alias(a.alias)
                )
                continue
            fn = {"count": F.count, "sum": F.sum,
                  "min": F.min, "max": F.max}[a.fn]
            agg_exprs.append(fn(col).alias(a.alias))
        if group_exprs:
            frame = base.groupBy(*group_exprs).agg(*agg_exprs)
        else:
            frame = base.agg(*agg_exprs)
        if plan.having is not None:
            cond = self._having_tree(plan.having)
            if cond is not None:
                frame = frame.filter(cond)
        # ordering/pagination over grouped output names (which may include
        # unselected grouping keys), then the final projection drops them
        frame = self._order_limit(frame, plan, output_names_only=True)
        # masking on grouped output columns (aggregation aliases never masked
        # — QUERY.md:197)
        out_cols: list[Column] = []
        emitted: set[str] = set()
        for s in plan.select_items:
            if s.out_name in emitted:
                continue
            emitted.add(s.out_name)
            c = F.col(s.out_name)
            if s.masked:
                c = mask_column(c, s.masking_fn or "full", s.col_type)
            out_cols.append(c.alias(s.out_name))
        for a in plan.aggregations:
            out_cols.append(F.col(a.alias))
        return frame.select(*out_cols)

    # -- projection / ordering ---------------------------------------------------

    def _projection(self, plan: ResolvedPlan) -> list[Column]:
        cols: list[Column] = []
        for s in plan.select_items:
            c = F.col(f"{s.table_alias}.{s.physical}")
            if s.masked:
                c = mask_column(c, s.masking_fn or "full", s.col_type)
            cols.append(c.alias(s.out_name))
        return cols

    def _order_limit(
        self, frame: DataFrame, plan: ResolvedPlan, *, output_names_only: bool
    ) -> DataFrame:
        if plan.order_by:
            exprs = []
            for o in plan.order_by:
                if o.agg_alias is not None:
                    col = F.col(o.agg_alias)
                elif output_names_only:
                    col = F.col(o.column_expr.split(".", 1)[1])  # best effort
                else:
                    col = F.col(o.column_expr)
                exprs.append(col.asc() if o.direction == "asc" else col.desc())
            frame = frame.orderBy(*exprs)
        if plan.offset:
            frame = frame.offset(plan.offset)
        if plan.limit is not None:
            frame = frame.limit(plan.limit)
        return frame

    # -- filter tree compilation ---------------------------------------------------

    def _tree(
        self, node: FilterTree, skip_flags: set[str] = frozenset()
    ) -> Column | None:
        if isinstance(node, GroupNode):
            parts = [
                c
                for c in (self._tree(n, skip_flags) for n in node.conditions)
                if c is not None
            ]
            if not parts:
                return None
            combined = functools.reduce(
                (lambda a, b: a & b) if node.logic == "and" else (lambda a, b: a | b),
                parts,
            )
            return ~combined if node.negate else combined
        if isinstance(node, ExistsPlan):
            if node.flag_name in skip_flags:
                return None  # applied as a semi/anti join
            return F.col(node.flag_name)
        if isinstance(node, ColumnFilter):
            return _compare(
                F.col(f"{node.left_alias}.{node.left_physical}"),
                node.operator,
                F.col(f"{node.right_alias}.{node.right_physical}"),
            )
        if isinstance(node, ValueFilter):
            return _value_condition(
                F.col(f"{node.table_alias}.{node.physical}"),
                node.operator,
                node.value,
            )
        if isinstance(node, HavingFilter):
            return _value_condition(F.col(node.alias), node.operator, node.value)
        raise TypeError(f"unknown filter node {node!r}")

    def _having_tree(self, node: FilterTree) -> Column | None:
        return self._tree(node)


def _compare(left: Column, op: str, right: Column) -> Column:
    return {
        "=": left == right,
        "!=": left != right,
        ">": left > right,
        "<": left < right,
        ">=": left >= right,
        "<=": left <= right,
    }[op]


def _value_condition(col: Column, op: str, value: Any) -> Column:
    """One of the 31 filter operators (README.md:290-318) as a built-in
    Column expression. 3VL notes: `!=` is NULL-INCLUSIVE (IS DISTINCT FROM
    — a NULL value counts as "not equal", contract C107), while notIn /
    notLike / notBetween keep standard SQL 3VL (NULL column → row
    excluded); size(NULL array) is NULL in Spark 4 (legacy sizeOfNull off)
    so arrayIsEmpty on a NULL array excludes the row (README.md:318)."""
    if op == "=":
        return col == F.lit(value)
    if op == "!=":
        # Null-inclusive inequality (IS DISTINCT FROM): a NULL value is "not
        # equal" to any literal — contract C107 asserts `isActive != true`
        # returns both false AND null rows (CONTRACT_TESTS.md:465).
        return ~col.eqNullSafe(F.lit(value))
    if op in (">", "<", ">=", "<="):
        return _compare(col, op, F.lit(value))
    if op == "in":
        return col.isin(*value)
    if op == "notIn":
        return ~col.isin(*value)
    if op == "like":
        return col.like(value)
    if op == "notLike":
        return ~col.like(value)
    if op == "ilike":
        return col.ilike(value)
    if op == "notIlike":
        return ~col.ilike(value)
    if op == "contains":
        return col.contains(F.lit(value))
    if op == "icontains":
        return F.lower(col).contains(F.lit(value.lower()))
    if op == "notContains":
        return ~col.contains(F.lit(value))
    if op == "notIcontains":
        return ~F.lower(col).contains(F.lit(value.lower()))
    if op == "startsWith":
        return col.startswith(F.lit(value))
    if op == "istartsWith":
        return F.lower(col).startswith(F.lit(value.lower()))
    if op == "endsWith":
        return col.endswith(F.lit(value))
    if op == "iendsWith":
        return F.lower(col).endswith(F.lit(value.lower()))
    if op == "between":
        return (col >= F.lit(value["from"])) & (col <= F.lit(value["to"]))
    if op == "notBetween":
        return ~((col >= F.lit(value["from"])) & (col <= F.lit(value["to"])))
    if op == "isNull":
        return col.isNull()
    if op == "isNotNull":
        return col.isNotNull()
    if op == "levenshteinLte":
        return F.levenshtein(col, F.lit(value["text"])) <= F.lit(
            value["maxDistance"]
        )
    if op == "arrayContains":
        return F.array_contains(col, F.lit(value))
    if op == "arrayContainsAll":
        needle = F.array(*[F.lit(v) for v in value])
        return F.size(F.array_except(needle, col)) == 0
    if op == "arrayContainsAny":
        needle = F.array(*[F.lit(v) for v in value])
        return F.arrays_overlap(col, needle)
    if op == "arrayIsEmpty":
        return F.size(col) == 0
    if op == "arrayIsNotEmpty":
        return F.size(col) > 0
    raise ValueError(f"unknown operator '{op}'")
