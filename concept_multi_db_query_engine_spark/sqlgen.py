"""Spark-SQL text renderer for ``executeMode: 'sql-only'``.

The reference generates Postgres/ClickHouse/Trino SQL (SQL_DIALECTS.md); our
single dialect is ``'spark'``. Rendered from the SAME ResolvedPlan the
DataFrame builder consumes, so the two representations cannot drift. Values
are emitted as ``?`` placeholders with an ordered params list (Trino-style,
SQL_DIALECTS.md:9-10); identifiers are backtick-quoted with embedded
backticks doubled (injection layer 2, SECURITY.md:27-45).
"""

from __future__ import annotations

from typing import Any

from .plans import (
    ColumnFilter,
    ExistsPlan,
    FilterTree,
    GroupNode,
    HavingFilter,
    ResolvedPlan,
    ValueFilter,
)


def quote_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


class SqlRenderer:
    def __init__(self) -> None:
        self.params: list[Any] = []

    def render(self, plan: ResolvedPlan) -> tuple[str, list[Any]]:
        parts: list[str] = []
        if plan.mode == "count":
            select = "SELECT COUNT(*) AS `count`"
        else:
            cols: list[str] = []
            if plan.aggregations:
                for s in plan.select_items:
                    cols.append(self._col(s.table_alias, s.physical)
                                + f" AS {quote_ident(s.out_name)}")
                for a in plan.aggregations:
                    if a.physical is None:
                        cols.append(f"COUNT(*) AS {quote_ident(a.alias)}")
                    elif a.fn == "avg":
                        # mirror the builder's decimal-avg convention
                        # (QUERY.md:173: avg types as decimal) so sql-only
                        # text and the executed plan agree numerically
                        c = self._col(a.table_alias, a.physical)
                        cols.append(
                            f"CAST(SUM(CAST({c} AS DECIMAL(28,10))) AS DOUBLE)"
                            f" / COUNT({c}) AS {quote_ident(a.alias)}"
                        )
                    else:
                        cols.append(
                            f"{a.fn.upper()}({self._col(a.table_alias, a.physical)})"
                            f" AS {quote_ident(a.alias)}"
                        )
            else:
                for s in plan.select_items:
                    cols.append(self._col(s.table_alias, s.physical)
                                + f" AS {quote_ident(s.out_name)}")
            distinct = "DISTINCT " if plan.distinct and not plan.aggregations else ""
            select = f"SELECT {distinct}" + ", ".join(cols)
        parts.append(select)
        parts.append(
            f"FROM {quote_ident(plan.from_physical)} AS {plan.from_alias}"
        )
        for j in plan.joins:
            kw = "INNER JOIN" if j.join_type == "inner" else "LEFT JOIN"
            parts.append(
                f"{kw} {quote_ident(j.physical_name)} AS {j.alias} ON "
                f"{self._col(j.left_alias, j.left_physical)} = "
                f"{self._col(j.alias, j.right_physical)}"
            )
        if plan.where is not None:
            w = self._tree(plan.where)
            if w:
                parts.append(f"WHERE {w}")
        if plan.mode != "count":
            # GROUP BY renders whenever grouping keys exist — also with NO
            # aggregations, where it de-duplicates the keys exactly like the
            # builder's groupBy().agg() with an empty agg list (QUERY.md:40-43)
            if plan.group_by:
                seen: set[str] = set()
                gb = []
                for s in plan.group_by:
                    if s.out_name in seen:
                        continue
                    seen.add(s.out_name)
                    gb.append(self._col(s.table_alias, s.physical))
                if gb:
                    parts.append("GROUP BY " + ", ".join(gb))
            elif plan.aggregations:
                pass  # global aggregate
            if plan.having is not None:
                h = self._tree(plan.having)
                if h:
                    parts.append(f"HAVING {h}")
            if plan.order_by:
                obs = []
                for o in plan.order_by:
                    ref = (
                        quote_ident(o.agg_alias)
                        if o.agg_alias is not None
                        else self._col(*o.column_expr.split(".", 1))
                    )
                    obs.append(f"{ref} {o.direction.upper()}")
                parts.append("ORDER BY " + ", ".join(obs))
            if plan.limit is not None:
                parts.append(f"LIMIT {int(plan.limit)}")
            if plan.offset:
                parts.append(f"OFFSET {int(plan.offset)}")
        return "\n".join(parts), self.params

    def _col(self, alias: str, physical: str) -> str:
        return f"{alias}.{quote_ident(physical)}"

    def _p(self, value: Any) -> str:
        self.params.append(value)
        return "?"

    def _tree(self, node: FilterTree) -> str:
        if isinstance(node, GroupNode):
            parts = [self._tree(c) for c in node.conditions]
            parts = [p for p in parts if p]
            if not parts:
                return ""
            joiner = " AND " if node.logic == "and" else " OR "
            body = parts[0] if len(parts) == 1 else "(" + joiner.join(parts) + ")"
            if node.negate:
                return f"NOT ({parts[0]})" if len(parts) == 1 else f"NOT {body}"
            return body
        if isinstance(node, ExistsPlan):
            return self._exists(node)
        if isinstance(node, ColumnFilter):
            return (
                f"{self._col(node.left_alias, node.left_physical)} "
                f"{'<>' if node.operator == '!=' else node.operator} "
                f"{self._col(node.right_alias, node.right_physical)}"
            )
        if isinstance(node, HavingFilter):
            return self._value(quote_ident(node.alias), node.operator, node.value)
        if isinstance(node, ValueFilter):
            return self._value(
                self._col(node.table_alias, node.physical), node.operator,
                node.value,
            )
        raise TypeError(f"unknown node {node!r}")

    def _exists(self, ep: ExistsPlan) -> str:
        inner_where = [
            f"{ep.alias}.{quote_ident(ep.child_physical)} = "
            f"{ep.outer_alias}.{quote_ident(ep.outer_physical)}"
        ]
        if ep.where is not None:
            w = self._tree(ep.where)
            if w:
                inner_where.append(w)
        sub = (
            f"SELECT {{}} FROM {quote_ident(ep.physical_name)} AS {ep.alias} "
            f"WHERE {' AND '.join(inner_where)}"
        )
        if ep.count_op is not None:
            return (
                f"({sub.format('COUNT(*)')}) "
                f"{'<>' if ep.count_op == '!=' else ep.count_op} "
                f"{self._p(ep.count_value)}"
            )
        kw = "NOT EXISTS" if ep.negated else "EXISTS"
        return f"{kw} ({sub.format('1')})"

    def _value(self, ref: str, op: str, value: Any) -> str:
        if op in ("=", "!=", ">", "<", ">=", "<="):
            if op == "!=":
                # null-inclusive, matching the builder's eqNullSafe negation
                # (contract C107, CONTRACT_TESTS.md:465)
                return f"{ref} IS DISTINCT FROM {self._p(value)}"
            return f"{ref} {op} {self._p(value)}"
        if op in ("in", "notIn"):
            ph = ", ".join(self._p(v) for v in value)
            kw = "IN" if op == "in" else "NOT IN"
            return f"{ref} {kw} ({ph})"
        if op in ("like", "notLike"):
            kw = "LIKE" if op == "like" else "NOT LIKE"
            return f"{ref} {kw} {self._p(value)}"
        if op in ("ilike", "notIlike"):
            kw = "ILIKE" if op == "ilike" else "NOT ILIKE"
            return f"{ref} {kw} {self._p(value)}"
        if op in ("contains", "notContains", "icontains", "notIcontains"):
            pat = f"%{escape_like(value)}%"
            neg = "NOT " if op.startswith("not") else ""
            if "contains" in op.lower() and op not in ("contains", "notContains"):
                return f"LOWER({ref}) {neg}LIKE LOWER({self._p(pat)})"
            return f"{ref} {neg}LIKE {self._p(pat)}"
        if op in ("startsWith", "istartsWith"):
            pat = f"{escape_like(value)}%"
            if op == "istartsWith":
                return f"LOWER({ref}) LIKE LOWER({self._p(pat)})"
            return f"{ref} LIKE {self._p(pat)}"
        if op in ("endsWith", "iendsWith"):
            pat = f"%{escape_like(value)}"
            if op == "iendsWith":
                return f"LOWER({ref}) LIKE LOWER({self._p(pat)})"
            return f"{ref} LIKE {self._p(pat)}"
        if op in ("between", "notBetween"):
            kw = "BETWEEN" if op == "between" else "NOT BETWEEN"
            return (
                f"{ref} {kw} {self._p(value['from'])} AND {self._p(value['to'])}"
            )
        if op == "isNull":
            return f"{ref} IS NULL"
        if op == "isNotNull":
            return f"{ref} IS NOT NULL"
        if op == "levenshteinLte":
            return (
                f"levenshtein({ref}, {self._p(value['text'])}) <= "
                f"{self._p(value['maxDistance'])}"
            )
        if op == "arrayContains":
            return f"array_contains({ref}, {self._p(value)})"
        if op == "arrayContainsAll":
            ph = ", ".join(self._p(v) for v in value)
            return f"size(array_except(array({ph}), {ref})) = 0"
        if op == "arrayContainsAny":
            ph = ", ".join(self._p(v) for v in value)
            return f"arrays_overlap({ref}, array({ph}))"
        if op == "arrayIsEmpty":
            return f"size({ref}) = 0"
        if op == "arrayIsNotEmpty":
            return f"size({ref}) > 0"
        raise ValueError(f"unknown operator '{op}'")


def escape_like(text: str) -> str:
    """Escape live LIKE wildcards in user text for contains/startsWith/
    endsWith patterns (SECURITY.md:83-88). The DataFrame path uses literal
    Contains/StartsWith/EndsWith expressions and needs no escaping; this is
    for the rendered SQL text only."""
    return text.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
