"""Query validation — the 14 rules (reference README.md:271-284), pure Python,
zero I/O, all errors collected into one ValidationError (README.md:286).

Runtime enum re-validation (operator/fn/direction/logic whitelists) is
included: raw JSON bypasses static types, so whitelists are security layer 1
(SECURITY.md:7-23).
"""

from __future__ import annotations

from typing import Any

from . import coltypes
from .access import EffectiveAccess
from .errors import (
    ACCESS_DENIED,
    INVALID_AGGREGATION,
    INVALID_BY_IDS,
    INVALID_EXISTS,
    INVALID_FILTER,
    INVALID_GROUP_BY,
    INVALID_HAVING,
    INVALID_LIMIT,
    INVALID_ORDER_BY,
    INVALID_VALUE,
    UNKNOWN_COLUMN,
    UNKNOWN_TABLE,
    INVALID_JOIN,
    ErrorItem,
)
from .metadata import ColumnMeta, MetadataIndex, TableMeta

FILTER_OPERATORS = frozenset(
    {
        "=", "!=", ">", "<", ">=", "<=", "in", "notIn", "like", "notLike",
        "ilike", "notIlike", "isNull", "isNotNull", "between", "notBetween",
        "contains", "icontains", "notContains", "notIcontains",
        "startsWith", "istartsWith", "endsWith", "iendsWith",
        "levenshteinLte", "arrayContains", "arrayContainsAll",
        "arrayContainsAny", "arrayIsEmpty", "arrayIsNotEmpty",
    }
)
COLUMN_FILTER_OPERATORS = frozenset({"=", "!=", ">", "<", ">=", "<="})
COMPARISON_OPS = frozenset({">", "<", ">=", "<="})
STRING_PATTERN_OPS = frozenset(
    {
        "like", "notLike", "ilike", "notIlike", "contains", "icontains",
        "notContains", "notIcontains", "startsWith", "istartsWith",
        "endsWith", "iendsWith",
    }
)
ARRAY_OPS = frozenset(
    {"arrayContains", "arrayContainsAll", "arrayContainsAny",
     "arrayIsEmpty", "arrayIsNotEmpty"}
)
NO_VALUE_OPS = frozenset({"isNull", "isNotNull", "arrayIsEmpty", "arrayIsNotEmpty"})
HAVING_OPERATORS = frozenset(
    {"=", "!=", ">", "<", ">=", "<=", "in", "notIn", "between", "notBetween",
     "isNull", "isNotNull"}
)
AGG_FNS = frozenset({"count", "sum", "avg", "min", "max"})
EXECUTE_MODES = frozenset({"execute", "sql-only", "count", "dataframe"})
FRESHNESS = frozenset({"realtime", "seconds", "minutes", "hours"})


def agg_result_type(fn: str, source_type: str | None) -> str:
    """count → int; avg → always decimal; sum/min/max → source type
    (QUERY.md:173, SQL_DIALECTS.md:86)."""
    if fn == "count":
        return "int"
    if fn == "avg":
        return "decimal"
    return source_type or "int"


class QueryValidator:
    """Validates one QueryDefinition against metadata + effective access.

    Usage: ``errors = QueryValidator(index, access).validate(defn)``.
    """

    def __init__(self, index: MetadataIndex, access: EffectiveAccess):
        self.index = index
        self.access = access
        self.errors: list[ErrorItem] = []

    # -- helpers -----------------------------------------------------------

    def _err(self, code: str, message: str, **details: Any) -> None:
        self.errors.append(ErrorItem(code, message, details or None))

    def _table(self, api_name: Any, where: str) -> TableMeta | None:
        if not isinstance(api_name, str):
            self._err(UNKNOWN_TABLE, f"table name must be a string in {where}")
            return None
        t = self.index.table(api_name)
        if t is None:
            self._err(
                UNKNOWN_TABLE, f"unknown table '{api_name}' in {where}",
                table=api_name,
            )
            return None
        if not self.access.can_read_table(t.id):
            self._err(
                ACCESS_DENIED, f"access denied to table '{api_name}'",
                table=api_name,
            )
            return None
        return t

    def _column(
        self, table: TableMeta, api_name: Any, where: str
    ) -> ColumnMeta | None:
        if not isinstance(api_name, str):
            self._err(UNKNOWN_COLUMN, f"column name must be a string in {where}")
            return None
        c = self.index.column(table.id, api_name)
        if c is None:
            self._err(
                UNKNOWN_COLUMN,
                f"unknown column '{table.api_name}.{api_name}' in {where}",
                table=table.api_name, column=api_name,
            )
            return None
        if not self.access.can_read_column(table.id, api_name):
            self._err(
                ACCESS_DENIED,
                f"access denied to column '{table.api_name}.{api_name}'",
                table=table.api_name, column=api_name,
            )
            return None
        return c

    # -- entry -------------------------------------------------------------

    def _as_list(self, value: Any, code: str, label: str) -> list:
        """Raw-JSON type guard (SECURITY.md:7-23): a field that must be a
        list but isn't yields one structured error and is treated as empty,
        so validation always completes and never raises."""
        if value is None:
            return []
        if not isinstance(value, list):
            self._err(code, f"{label} must be a list")
            return []
        return value

    def validate(self, defn: dict[str, Any]) -> list[ErrorItem]:
        if not isinstance(defn, dict):
            self._err(INVALID_VALUE, "query definition must be an object")
            return self.errors

        from_table = self._table(defn.get("from"), "'from'")
        if from_table is None:
            return self.errors  # nothing else is resolvable

        # join tables first: filters may qualify them
        joined: dict[str, TableMeta] = {}  # apiName → table
        query_tables: dict[str, TableMeta] = {from_table.api_name: from_table}
        for i, join in enumerate(
            self._as_list(defn.get("joins"), INVALID_JOIN, "'joins'")
        ):
            if not isinstance(join, dict):
                self._err(INVALID_JOIN, f"join #{i} must be an object", joinIndex=i)
                continue
            jt = self._table(join.get("table"), f"join #{i}")
            if jt is None:
                continue
            if jt.api_name in query_tables:
                self._err(
                    INVALID_JOIN,
                    f"table '{jt.api_name}' joined more than once",
                    joinIndex=i, table=jt.api_name,
                )
                continue
            jtype = join.get("type", "left")
            if jtype not in ("inner", "left"):
                self._err(
                    INVALID_JOIN,
                    f"join #{i}: invalid join type '{jtype}'",
                    joinIndex=i, type=str(jtype),
                )
            edge = self.index.find_relation_to_any(
                jt.id, [t.id for t in query_tables.values()]
            )
            if edge is None:
                self._err(
                    INVALID_JOIN,
                    f"no relation connects '{jt.api_name}' to the query "
                    "(directly or transitively)",
                    joinIndex=i, table=jt.api_name,
                )
            query_tables[jt.api_name] = jt
            joined[jt.api_name] = jt
            for c in self._as_list(
                join.get("columns"), INVALID_JOIN, f"join #{i} 'columns'"
            ):
                self._column(jt, c, f"join #{i} columns")

        # explicit selected columns
        explicit_cols = defn.get("columns")
        if explicit_cols is not None:
            if not isinstance(explicit_cols, list):
                self._err(INVALID_VALUE, "'columns' must be a list")
                explicit_cols = None
            else:
                for c in explicit_cols:
                    self._column(from_table, c, "'columns'")

        aggregations = self._as_list(
            defn.get("aggregations"), INVALID_AGGREGATION, "'aggregations'"
        )
        group_by = self._as_list(
            defn.get("groupBy"), INVALID_GROUP_BY, "'groupBy'"
        )

        # filters
        for i, f in enumerate(
            self._as_list(defn.get("filters"), INVALID_FILTER, "'filters'")
        ):
            self._validate_condition(
                f, from_table, query_tables, f"filters[{i}]", exists_depth=0
            )

        # join-scoped filters (default table = the joined table, QUERY.md:54-56)
        for i, join in enumerate(defn.get("joins") or []):
            if not isinstance(join, dict):
                continue
            jt = joined.get(join.get("table"))
            if jt is None:
                continue
            for k, f in enumerate(self._as_list(
                join.get("filters"), INVALID_FILTER, f"joins[{i}].filters"
            )):
                self._validate_condition(
                    f, jt, query_tables, f"joins[{i}].filters[{k}]", exists_depth=0
                )

        # aggregations (rule 14)
        agg_aliases: dict[str, str] = {}  # alias → result type
        selected_names = {
            c for c in (explicit_cols or []) if isinstance(c, str)
        }
        for i, agg in enumerate(aggregations):
            if not isinstance(agg, dict):
                self._err(INVALID_AGGREGATION, f"aggregation #{i} must be an object")
                continue
            fn = agg.get("fn")
            if not isinstance(fn, str) or fn not in AGG_FNS:
                self._err(
                    INVALID_AGGREGATION,
                    f"aggregation #{i}: invalid fn '{fn}'", fn=str(fn),
                )
                continue
            alias = agg.get("alias")
            if not isinstance(alias, str) or not alias:
                self._err(
                    INVALID_AGGREGATION, f"aggregation #{i}: alias is required"
                )
                continue
            if alias in agg_aliases:
                self._err(
                    INVALID_AGGREGATION,
                    f"duplicate aggregation alias '{alias}'", alias=alias,
                )
            if alias in selected_names:
                self._err(
                    INVALID_AGGREGATION,
                    f"aggregation alias '{alias}' collides with a selected column",
                    alias=alias,
                )
            col_name = agg.get("column")
            if col_name == "*":
                if fn != "count":
                    self._err(
                        INVALID_AGGREGATION,
                        f"aggregation #{i}: column '*' is only valid for count",
                    )
                agg_aliases[alias] = agg_result_type(fn, None)
                continue
            at = from_table
            if agg.get("table") is not None:
                att = self.index.table(agg["table"])
                if att is None or att.api_name not in query_tables:
                    self._err(
                        INVALID_AGGREGATION,
                        f"aggregation #{i}: table '{agg.get('table')}' is not "
                        "part of the query",
                    )
                    continue
                at = att
            col = self._column(at, col_name, f"aggregation #{i}")
            if col is None:
                continue
            if coltypes.is_array(col.type):
                self._err(
                    INVALID_AGGREGATION,
                    f"aggregation #{i}: array column '{col_name}' cannot be "
                    "aggregated",
                )
                continue
            if fn in ("sum", "avg") and col.type not in coltypes.NUMERIC_FAMILY:
                self._err(
                    INVALID_AGGREGATION,
                    f"aggregation #{i}: {fn}() requires a numeric column, got "
                    f"'{col.type}'",
                )
                continue
            agg_aliases[alias] = agg_result_type(fn, col.type)

        if explicit_cols == [] and not aggregations:
            self._err(
                INVALID_AGGREGATION,
                "'columns: []' requires at least one aggregation",
            )

        # groupBy (rule 7)
        group_cols: set[tuple[str, str]] = set()
        for i, g in enumerate(group_by):
            if not isinstance(g, dict):
                self._err(INVALID_GROUP_BY, f"groupBy #{i} must be an object")
                continue
            gt = from_table
            if g.get("table") is not None:
                gtt = self.index.table(g["table"])
                if gtt is None or gtt.api_name not in query_tables:
                    self._err(
                        INVALID_GROUP_BY,
                        f"groupBy #{i}: table '{g.get('table')}' is not part "
                        "of the query",
                    )
                    continue
                gt = gtt
            col = self._column(gt, g.get("column"), f"groupBy #{i}")
            if col is None:
                continue
            if coltypes.is_array(col.type):
                self._err(
                    INVALID_GROUP_BY,
                    f"groupBy #{i}: array column '{col.api_name}' cannot be "
                    "grouped",
                )
            group_cols.add((gt.api_name, col.api_name))

        if aggregations and explicit_cols:
            for c in explicit_cols:
                if isinstance(c, str) and (from_table.api_name, c) not in group_cols:
                    self._err(
                        INVALID_GROUP_BY,
                        f"selected column '{c}' must appear in groupBy when "
                        "aggregations are present",
                        column=c,
                    )
        if aggregations:
            for i, join in enumerate(defn.get("joins") or []):
                if not isinstance(join, dict):
                    continue
                jt = joined.get(join.get("table"))
                if jt is None:
                    continue
                for c in join.get("columns") or []:
                    if isinstance(c, str) and (jt.api_name, c) not in group_cols:
                        self._err(
                            INVALID_GROUP_BY,
                            f"selected column '{jt.api_name}.{c}' must appear "
                            "in groupBy when aggregations are present",
                            table=jt.api_name, column=c,
                        )

        # having (rule 8)
        having = self._as_list(defn.get("having"), INVALID_HAVING, "'having'")
        if having and not aggregations:
            self._err(
                INVALID_HAVING, "'having' requires aggregations", havingCount=len(having)
            )
        for i, h in enumerate(having):
            self._validate_having(h, agg_aliases, f"having[{i}]")

        # orderBy (rule 9)
        for i, o in enumerate(
            self._as_list(defn.get("orderBy"), INVALID_ORDER_BY, "'orderBy'")
        ):
            if not isinstance(o, dict):
                self._err(INVALID_ORDER_BY, f"orderBy #{i} must be an object")
                continue
            direction = o.get("direction", "asc")
            if direction not in ("asc", "desc"):
                self._err(
                    INVALID_ORDER_BY,
                    f"orderBy #{i}: invalid direction '{direction}'",
                )
            col_name = o.get("column")
            if o.get("table") is None and isinstance(col_name, str) and (
                col_name in agg_aliases
            ):
                continue  # aggregation alias
            ot = from_table
            if o.get("table") is not None:
                ott = self.index.table(o["table"])
                if ott is None or ott.api_name not in query_tables:
                    self._err(
                        INVALID_ORDER_BY,
                        f"orderBy #{i}: table '{o.get('table')}' is not part "
                        "of the query",
                    )
                    continue
                ot = ott
            # rule 9 owns orderBy column problems: a nonexistent orderBy
            # column is INVALID_ORDER_BY, not UNKNOWN_COLUMN (contract
            # C1467, CONTRACT_TESTS.md:1009)
            if isinstance(col_name, str) and \
                    self.index.column(ot.id, col_name) is None:
                self._err(
                    INVALID_ORDER_BY,
                    f"orderBy #{i}: unknown column "
                    f"'{ot.api_name}.{col_name}'",
                )
                continue
            col = self._column(ot, col_name, f"orderBy #{i}")
            if col is None:
                continue
            if coltypes.is_array(col.type):
                self._err(
                    INVALID_ORDER_BY,
                    f"orderBy #{i}: array column '{col.api_name}' cannot be "
                    "ordered",
                )
            if aggregations and (ot.api_name, col.api_name) not in group_cols:
                self._err(
                    INVALID_ORDER_BY,
                    f"orderBy #{i}: column '{col.api_name}' must be a groupBy "
                    "column or aggregation alias",
                )

        # byIds (rule 10)
        by_ids = defn.get("byIds")
        if by_ids is not None:
            if not isinstance(by_ids, list) or len(by_ids) == 0:
                self._err(INVALID_BY_IDS, "'byIds' must be a non-empty list")
            elif len(from_table.primary_key) != 1:
                self._err(
                    INVALID_BY_IDS,
                    f"'byIds' requires a single-column primary key; "
                    f"'{from_table.api_name}' has "
                    f"{len(from_table.primary_key)} PK column(s)",
                )
            else:
                pk_col = self.index.column(from_table.id, from_table.primary_key[0])
                if pk_col is not None:
                    for v in by_ids:
                        if not coltypes.value_matches_type(v, pk_col.type):
                            self._err(
                                INVALID_BY_IDS,
                                f"byIds value {v!r} does not match primary key "
                                f"type '{pk_col.type}'",
                            )
                            break
            if group_by or aggregations:
                self._err(
                    INVALID_BY_IDS,
                    "'byIds' cannot be combined with groupBy/aggregations",
                )

        # limit/offset (rule 11)
        limit = defn.get("limit")
        offset = defn.get("offset")
        if limit is not None and (
            not isinstance(limit, int) or isinstance(limit, bool) or limit < 0
        ):
            self._err(INVALID_LIMIT, "'limit' must be a non-negative integer")
        if offset is not None:
            if not isinstance(offset, int) or isinstance(offset, bool) or offset < 0:
                self._err(INVALID_LIMIT, "'offset' must be a non-negative integer")
            elif limit is None:
                self._err(INVALID_LIMIT, "'offset' requires 'limit'")

        # enum re-validation (security layer 1); guard isinstance first —
        # unhashable raw-JSON values (lists/dicts) cannot hit `in set`
        mode = defn.get("executeMode", "execute")
        if not isinstance(mode, str) or mode not in EXECUTE_MODES:
            self._err(INVALID_VALUE, f"invalid executeMode '{mode}'")
        freshness = defn.get("freshness")
        if freshness is not None and (
            not isinstance(freshness, str) or freshness not in FRESHNESS
        ):
            self._err(INVALID_VALUE, f"invalid freshness '{freshness}'")
        if not isinstance(defn.get("distinct", False), bool):
            self._err(INVALID_VALUE, "'distinct' must be a boolean")
        if not isinstance(defn.get("debug", False), bool):
            self._err(INVALID_VALUE, "'debug' must be a boolean")

        return self.errors

    # -- filters -----------------------------------------------------------

    def _validate_condition(
        self,
        f: Any,
        default_table: TableMeta,
        query_tables: dict[str, TableMeta],
        where: str,
        exists_depth: int,
    ) -> None:
        if not isinstance(f, dict):
            self._err(INVALID_FILTER, f"{where}: filter must be an object")
            return

        if "logic" in f:  # QueryFilterGroup
            if f["logic"] not in ("and", "or"):
                self._err(INVALID_FILTER, f"{where}: invalid logic '{f['logic']}'")
            conds = f.get("conditions")
            if not isinstance(conds, list) or not conds:
                self._err(
                    INVALID_FILTER, f"{where}: group conditions must be non-empty"
                )
                return
            if not isinstance(f.get("not", False), bool):
                self._err(INVALID_FILTER, f"{where}: 'not' must be a boolean")
            for i, c in enumerate(conds):
                self._validate_condition(
                    c, default_table, query_tables, f"{where}.conditions[{i}]",
                    exists_depth,
                )
            return

        if "exists" in f or ("table" in f and "column" not in f):  # exists filter
            self._validate_exists(f, default_table, query_tables, where, exists_depth)
            return

        if "refColumn" in f:  # QueryColumnFilter
            op = f.get("operator")
            if not isinstance(op, str) or op not in COLUMN_FILTER_OPERATORS:
                self._err(
                    INVALID_FILTER,
                    f"{where}: invalid column-filter operator '{op}'",
                )
                return
            lt = self._filter_table(f.get("table"), default_table, query_tables, where)
            rt = self._filter_table(
                f.get("refTable"), default_table, query_tables, where
            )
            if lt is None or rt is None:
                return
            lc = self._column(lt, f.get("column"), where)
            rc = self._column(rt, f.get("refColumn"), where)
            if lc is None or rc is None:
                return
            if coltypes.is_array(lc.type) or coltypes.is_array(rc.type):
                self._err(
                    INVALID_FILTER,
                    f"{where}: column-filters cannot compare array columns",
                )
                return
            if not coltypes.same_family(lc.type, rc.type):
                self._err(
                    INVALID_FILTER,
                    f"{where}: incompatible column types '{lc.type}' vs "
                    f"'{rc.type}'",
                )
            return

        # QueryFilter (value filter)
        op = f.get("operator")
        if not isinstance(op, str) or op not in FILTER_OPERATORS:
            self._err(INVALID_FILTER, f"{where}: invalid operator '{op}'")
            return
        ft = self._filter_table(f.get("table"), default_table, query_tables, where)
        if ft is None:
            return
        col = self._column(ft, f.get("column"), where)
        if col is None:
            return
        self._validate_operator_value(op, f.get("value"), "value" in f, col, where)

    def _filter_table(
        self,
        qualifier: Any,
        default_table: TableMeta,
        query_tables: dict[str, TableMeta],
        where: str,
    ) -> TableMeta | None:
        """Resolve a filter's optional ``table`` qualifier. It must name a
        table that is part of the query (from/joins) — QUERY.md:54-56."""
        if qualifier is None:
            return default_table
        t = self.index.table(qualifier)
        if t is None:
            self._err(
                UNKNOWN_TABLE, f"{where}: unknown table '{qualifier}'",
                table=str(qualifier),
            )
            return None
        if (
            t.api_name not in query_tables
            and t.api_name != default_table.api_name
        ):
            self._err(
                INVALID_FILTER,
                f"{where}: table '{qualifier}' is not part of the query",
                table=str(qualifier),
            )
            return None
        return t

    def _validate_operator_value(
        self, op: str, value: Any, has_value: bool, col: ColumnMeta, where: str
    ) -> None:
        is_arr = coltypes.is_array(col.type)
        etype = coltypes.elem_type(col.type)

        if op in NO_VALUE_OPS:
            if has_value and value is not None:
                self._err(
                    INVALID_VALUE, f"{where}: operator '{op}' takes no value"
                )
            if op in ("isNull", "isNotNull") and not col.nullable:
                self._err(
                    INVALID_FILTER,
                    f"{where}: column '{col.api_name}' is not nullable",
                )
            if op in ("arrayIsEmpty", "arrayIsNotEmpty") and not is_arr:
                self._err(
                    INVALID_FILTER,
                    f"{where}: operator '{op}' requires an array column",
                )
            return

        if op in ARRAY_OPS:
            if not is_arr:
                self._err(
                    INVALID_FILTER,
                    f"{where}: operator '{op}' requires an array column",
                )
                return
            if op == "arrayContains":
                if not coltypes.value_matches_type(value, etype):
                    self._err(
                        INVALID_VALUE,
                        f"{where}: arrayContains value must match element "
                        f"type '{etype}'",
                    )
                return
            # arrayContainsAll / arrayContainsAny
            if not isinstance(value, list) or not value:
                self._err(
                    INVALID_VALUE,
                    f"{where}: operator '{op}' requires a non-empty array value",
                )
                return
            for v in value:
                if not coltypes.value_matches_type(v, etype):
                    self._err(
                        INVALID_VALUE,
                        f"{where}: '{op}' element {v!r} does not match element "
                        f"type '{etype}'",
                    )
                    return
            return

        # every remaining operator is scalar-only (README.md:275, 318)
        if is_arr:
            self._err(
                INVALID_FILTER,
                f"{where}: operator '{op}' cannot apply to array column "
                f"'{col.api_name}'",
            )
            return

        if op in ("=", "!="):
            if not coltypes.value_matches_type(value, col.type):
                self._err(
                    INVALID_VALUE,
                    f"{where}: value {value!r} does not match column type "
                    f"'{col.type}'",
                )
            return

        if op in COMPARISON_OPS:
            if col.type not in coltypes.ORDERABLE_TYPES:
                self._err(
                    INVALID_FILTER,
                    f"{where}: operator '{op}' is not valid for type "
                    f"'{col.type}'",
                )
                return
            if not coltypes.value_matches_type(value, col.type):
                self._err(
                    INVALID_VALUE,
                    f"{where}: value {value!r} does not match column type "
                    f"'{col.type}'",
                )
            return

        if op in ("in", "notIn"):
            if col.type not in coltypes.IN_TYPES:
                self._err(
                    INVALID_FILTER,
                    f"{where}: operator '{op}' is not valid for type "
                    f"'{col.type}'",
                )
                return
            if not isinstance(value, list) or not value:
                self._err(
                    INVALID_VALUE,
                    f"{where}: operator '{op}' requires a non-empty list",
                )
                return
            for v in value:
                if v is None:
                    self._err(
                        INVALID_VALUE,
                        f"{where}: '{op}' list cannot contain null "
                        "(three-valued-logic footgun)",
                    )
                    return
                if not coltypes.value_matches_type(v, col.type):
                    self._err(
                        INVALID_VALUE,
                        f"{where}: '{op}' element {v!r} does not match column "
                        f"type '{col.type}'",
                    )
                    return
            return

        if op in STRING_PATTERN_OPS:
            if col.type != "string":
                self._err(
                    INVALID_FILTER,
                    f"{where}: operator '{op}' requires a string column",
                )
                return
            if not isinstance(value, str):
                self._err(
                    INVALID_VALUE,
                    f"{where}: operator '{op}' requires a string value",
                )
            return

        if op in ("between", "notBetween"):
            if col.type not in coltypes.ORDERABLE_TYPES:
                self._err(
                    INVALID_FILTER,
                    f"{where}: operator '{op}' is not valid for type "
                    f"'{col.type}'",
                )
                return
            if not isinstance(value, dict) or "from" not in value or "to" not in value:
                self._err(
                    INVALID_VALUE,
                    f"{where}: operator '{op}' requires {{from, to}} bounds",
                )
                return
            for bound in ("from", "to"):
                if value[bound] is None or not coltypes.value_matches_type(
                    value[bound], col.type
                ):
                    self._err(
                        INVALID_VALUE,
                        f"{where}: '{op}' bound '{bound}' must match column "
                        f"type '{col.type}' and not be null",
                    )
                    return
            return

        if op == "levenshteinLte":
            if col.type != "string":
                self._err(
                    INVALID_FILTER,
                    f"{where}: levenshteinLte requires a string column",
                )
                return
            if (
                not isinstance(value, dict)
                or not isinstance(value.get("text"), str)
                or not isinstance(value.get("maxDistance"), int)
                or isinstance(value.get("maxDistance"), bool)
                or value["maxDistance"] < 0
            ):
                self._err(
                    INVALID_VALUE,
                    f"{where}: levenshteinLte requires {{text: string, "
                    "maxDistance: non-negative int}}",
                )
            return

    # -- exists --------------------------------------------------------------

    def _validate_exists(
        self,
        f: dict[str, Any],
        parent_table: TableMeta,
        query_tables: dict[str, TableMeta],
        where: str,
        exists_depth: int,
    ) -> None:
        et = self._table(f.get("table"), where)
        if et is None:
            return
        if not isinstance(f.get("exists", True), bool):
            self._err(INVALID_EXISTS, f"{where}: 'exists' must be a boolean")
        # top-level EXISTS resolves against from/joined tables; nested EXISTS
        # resolve against the outer EXISTS's table (README.md:282)
        if exists_depth == 0:
            candidates = [t.id for t in query_tables.values()]
        else:
            candidates = [parent_table.id]
        edge = self.index.find_relation_to_any(et.id, candidates)
        if edge is None:
            self._err(
                INVALID_EXISTS,
                f"{where}: no relation connects '{et.api_name}' to "
                f"'{parent_table.api_name}'",
                table=et.api_name,
            )
        count = f.get("count")
        if count is not None:
            if (
                not isinstance(count, dict)
                or not isinstance(count.get("operator"), str)
                or count.get("operator") not in COLUMN_FILTER_OPERATORS
                or not isinstance(count.get("value"), int)
                or isinstance(count.get("value"), bool)
                or count["value"] < 0
            ):
                self._err(
                    INVALID_EXISTS,
                    f"{where}: count requires {{operator: =|!=|>|<|>=|<=, "
                    "value: non-negative int}}",
                )
        for i, inner in enumerate(f.get("filters") or []):
            # inner filters default to (and may only reference) the EXISTS
            # table + its own nested EXISTS
            self._validate_condition(
                inner, et, {et.api_name: et}, f"{where}.filters[{i}]",
                exists_depth + 1,
            )

    # -- having ----------------------------------------------------------------

    def _validate_having(
        self, h: Any, agg_aliases: dict[str, str], where: str
    ) -> None:
        if not isinstance(h, dict):
            self._err(INVALID_HAVING, f"{where}: having filter must be an object")
            return
        if "logic" in h:
            if h["logic"] not in ("and", "or"):
                self._err(INVALID_HAVING, f"{where}: invalid logic '{h['logic']}'")
            conds = h.get("conditions")
            if not isinstance(conds, list) or not conds:
                self._err(
                    INVALID_HAVING, f"{where}: group conditions must be non-empty"
                )
                return
            for i, c in enumerate(conds):
                self._validate_having(c, agg_aliases, f"{where}.conditions[{i}]")
            return
        if "table" in h:
            self._err(
                INVALID_HAVING,
                f"{where}: having filters cannot use a table qualifier",
            )
            return
        if "refColumn" in h:
            self._err(
                INVALID_HAVING,
                f"{where}: having filters cannot compare columns",
            )
            return
        alias = h.get("column")
        if alias not in agg_aliases:
            self._err(
                INVALID_HAVING,
                f"{where}: '{alias}' is not an aggregation alias",
                alias=str(alias),
            )
            return
        op = h.get("operator")
        if not isinstance(op, str) or op not in HAVING_OPERATORS:
            self._err(
                INVALID_HAVING,
                f"{where}: operator '{op}' is not allowed in having",
            )
            return
        rtype = agg_aliases[alias]
        value = h.get("value")
        if op in ("isNull", "isNotNull"):
            return  # always allowed on aliases (README.md:314)
        if op in ("in", "notIn"):
            if not isinstance(value, list) or not value or any(
                v is None or not coltypes.value_matches_type(v, rtype)
                for v in value
            ):
                self._err(
                    INVALID_HAVING,
                    f"{where}: '{op}' requires a non-empty list matching type "
                    f"'{rtype}'",
                )
            return
        if op in ("between", "notBetween"):
            if not isinstance(value, dict) or any(
                value.get(b) is None
                or not coltypes.value_matches_type(value[b], rtype)
                for b in ("from", "to")
            ):
                self._err(
                    INVALID_HAVING,
                    f"{where}: '{op}' requires {{from, to}} matching type "
                    f"'{rtype}'",
                )
            return
        if not coltypes.value_matches_type(value, rtype):
            self._err(
                INVALID_HAVING,
                f"{where}: value {value!r} does not match aggregation type "
                f"'{rtype}'",
            )
