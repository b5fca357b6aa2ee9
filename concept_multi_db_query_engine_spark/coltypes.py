"""Logical column type system.

Reference (METADATA.md:34-45): scalar types string/int/decimal/boolean/uuid/
date/timestamp plus ``T[]`` array variants; element type derived by stripping
``[]``. We add ``float`` (and ``float[]``) as an engine extension — the
reference delegates storage to Postgres/ClickHouse which have native doubles,
and the driver's parquet fixtures use DOUBLE columns; forcing them through
decimal would silently change results.
"""

from __future__ import annotations

import datetime
import decimal
from typing import Any

from pyspark.sql import types as T

SCALAR_TYPES = (
    "string",
    "int",
    "decimal",
    "float",
    "boolean",
    "uuid",
    "date",
    "timestamp",
)
ARRAY_TYPES = tuple(f"{t}[]" for t in SCALAR_TYPES)
ALL_TYPES = SCALAR_TYPES + ARRAY_TYPES

# operator/type matrix families (reference README.md:290-318)
ORDERABLE_TYPES = ("string", "int", "decimal", "float", "date", "timestamp")
IN_TYPES = ("string", "int", "decimal", "float", "uuid")
NUMERIC_FAMILY = ("int", "decimal", "float")
TEMPORAL_FAMILY = ("date", "timestamp")


def is_array(col_type: str) -> bool:
    return col_type.endswith("[]")


def elem_type(col_type: str) -> str:
    """Element type of an array type (reference METADATA.md:41)."""
    return col_type[:-2] if col_type.endswith("[]") else col_type


def same_family(a: str, b: str) -> bool:
    """Column-vs-column comparison compatibility: same type, or same family
    (numeric int/decimal/float, temporal date/timestamp) — QUERY.md:83-84."""
    if a == b:
        return True
    if a in NUMERIC_FAMILY and b in NUMERIC_FAMILY:
        return True
    if a in TEMPORAL_FAMILY and b in TEMPORAL_FAMILY:
        return True
    return False


def spark_type(col_type: str) -> T.DataType:
    """Logical type → Spark type (SURVEY.md §1.2 mapping)."""
    if is_array(col_type):
        return T.ArrayType(spark_type(elem_type(col_type)))
    return {
        "string": T.StringType(),
        "int": T.LongType(),
        "decimal": T.DecimalType(38, 10),
        "float": T.DoubleType(),
        "boolean": T.BooleanType(),
        "uuid": T.StringType(),
        "date": T.DateType(),
        "timestamp": T.TimestampType(),
    }[col_type]


def value_matches_type(value: Any, col_type: str) -> bool:
    """Is this Python literal acceptable for the logical scalar type?

    Mirrors the reference's strict value validation (rule 5, README.md:275):
    type mismatches are validation errors, never runtime cast errors.
    """
    if value is None:
        return False
    if col_type == "string" or col_type == "uuid":
        return isinstance(value, str)
    if col_type == "int":
        return isinstance(value, int) and not isinstance(value, bool)
    if col_type in ("decimal", "float"):
        return (
            isinstance(value, (int, float, decimal.Decimal))
            and not isinstance(value, bool)
        )
    if col_type == "boolean":
        return isinstance(value, bool)
    if col_type == "date":
        if isinstance(value, datetime.date) and not isinstance(
            value, datetime.datetime
        ):
            return True
        if isinstance(value, str):
            try:
                datetime.date.fromisoformat(value)
                return True
            except ValueError:
                return False
        return False
    if col_type == "timestamp":
        if isinstance(value, datetime.datetime):
            return True
        if isinstance(value, str):
            try:
                datetime.datetime.fromisoformat(value.replace("Z", "+00:00"))
                return True
            except ValueError:
                return False
        return False
    return False


def to_python(value: Any, col_type: str) -> Any:
    """Coerce a validated literal into the canonical Python value used to
    build a typed Spark literal."""
    if col_type == "date" and isinstance(value, str):
        return datetime.date.fromisoformat(value)
    if col_type == "timestamp" and isinstance(value, str):
        dt = datetime.datetime.fromisoformat(value.replace("Z", "+00:00"))
        if dt.tzinfo is not None:
            dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return dt
    if col_type == "decimal" and isinstance(value, (int, float)):
        return decimal.Decimal(str(value))
    if col_type == "float" and isinstance(value, decimal.Decimal):
        return float(value)
    return value
