"""Column masking — the 7 predefined masking functions (METADATA.md:120-134).

Two equivalent implementations, tested against each other:

- ``mask_column``: Spark Column expressions. The reference masks post-fetch
  (fine for collect()-sized results); at 100 TB posture masking must run
  distributed inside the plan so raw values never reach the driver.
- ``mask_value``: plain-Python, used for the cache fast-path (rows served
  from the cache never pass through Spark).

NULL values pass through unmasked (contract C815). A masked column with no
``maskingFn`` in metadata gets ``full`` as the safe default.
"""

from __future__ import annotations

import datetime
import decimal
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

MASKING_FNS = ("email", "phone", "name", "uuid", "number", "date", "full")


def mask_column(col: Column, fn: str, col_type: str) -> Column:
    """Masked Column expression; NULL passthrough is automatic for the string
    builders (concat of NULL → NULL) and explicit elsewhere."""
    if fn == "email":
        # john@example.com → j***@***.com
        masked = F.concat(
            F.substring(col, 1, 1),
            F.lit("***@***."),
            F.substring_index(col, ".", -1),
        )
    elif fn == "phone":
        # +1234567890 → +1***890 (country code + last 3)
        masked = F.concat(
            F.substring(col, 1, 2), F.lit("***"), F.substring(col, -3, 3)
        )
    elif fn == "name":
        # John Smith → J********h (first + last char)
        masked = F.concat(
            F.substring(col, 1, 1),
            F.repeat(F.lit("*"), F.greatest(F.length(col) - 2, F.lit(1))),
            F.substring(col, -1, 1),
        )
    elif fn == "uuid":
        # a1b2c3d4-... → a1b2****
        masked = F.concat(F.substring(col, 1, 4), F.lit("****"))
    elif fn == "number":
        masked = F.lit(0).cast("double") if col_type == "float" else F.lit(0).cast(
            "decimal(38,10)" if col_type == "decimal" else "long"
        )
    elif fn == "date":
        # truncate to year: 2025-03-15 → 2025-01-01
        masked = (
            F.date_trunc("year", col)
            if col_type == "timestamp"
            else F.trunc(col, "year")
        )
    else:  # 'full' — safe default
        masked = F.lit("***")
    return F.when(col.isNull(), F.lit(None)).otherwise(masked)


def mask_value(value: Any, fn: str, col_type: str) -> Any:
    """Python-side masking (cache fast-path) — must agree with mask_column."""
    if value is None:
        return None
    if fn == "email":
        s = str(value)
        return f"{s[:1]}***@***.{s.rsplit('.', 1)[-1]}"
    if fn == "phone":
        s = str(value)
        return f"{s[:2]}***{s[-3:]}"
    if fn == "name":
        s = str(value)
        return f"{s[:1]}{'*' * max(len(s) - 2, 1)}{s[-1:]}"
    if fn == "uuid":
        return f"{str(value)[:4]}****"
    if fn == "number":
        # type-matched zero so cache-served and Spark-served rows are
        # byte-identical: mask_column casts to double/decimal(38,10)/long
        if col_type == "float":
            return 0.0
        if col_type == "decimal":
            return decimal.Decimal(0).scaleb(-10)  # Decimal('0E-10') ≙ (38,10)
        return 0
    if fn == "date":
        if isinstance(value, datetime.datetime):
            return value.replace(month=1, day=1, hour=0, minute=0, second=0,
                                 microsecond=0)
        if isinstance(value, datetime.date):
            return value.replace(month=1, day=1)
        s = str(value)
        return f"{s[:4]}-01-01"
    return "***"
