"""Contract-test fixture: schemas + normative seed rows extracted from the
reference's contract suite (CONTRACT_TESTS.md:91-374, mirrored in
/root/repo/FIXTURES.md). Assertions in the test suite are exact row-sets
against this data (e.g. C100: samples status='active' → ids 1 and 4).
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import SparkSession, types as T

from concept_multi_db_query_engine_spark import (
    MemorySource,
    Metadata,
    SourceRegistry,
)
from concept_multi_db_query_engine_spark.coltypes import spark_type
from concept_multi_db_query_engine_spark.metadata import TableMeta


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s.replace("Z", "+00:00")).replace(tzinfo=None)


def d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def dec(x) -> Decimal | None:
    return None if x is None else Decimal(str(x))


METADATA = {
    "databases": [
        {"id": "pg-main", "engine": "postgres"},
        {"id": "ch-analytics", "engine": "clickhouse"},
    ],
    "tables": [
        {
            "id": "samples", "apiName": "samples", "database": "pg-main",
            "physicalName": "samples", "primaryKey": ["id"],
            "columns": [
                {"apiName": "id", "physicalName": "id", "type": "int"},
                {"apiName": "name", "physicalName": "name", "type": "string"},
                {"apiName": "email", "physicalName": "email", "type": "string"},
                {"apiName": "category", "physicalName": "category", "type": "string"},
                {"apiName": "amount", "physicalName": "amount", "type": "decimal"},
                {"apiName": "discount", "physicalName": "discount",
                 "type": "decimal", "nullable": True},
                {"apiName": "status", "physicalName": "status", "type": "string"},
                {"apiName": "tags", "physicalName": "tags", "type": "string[]",
                 "nullable": True},
                {"apiName": "scores", "physicalName": "scores", "type": "int[]",
                 "nullable": True},
                {"apiName": "isActive", "physicalName": "is_active",
                 "type": "boolean", "nullable": True},
                {"apiName": "note", "physicalName": "note", "type": "string",
                 "nullable": True},
                {"apiName": "createdAt", "physicalName": "created_at",
                 "type": "timestamp"},
                {"apiName": "dueDate", "physicalName": "due_date", "type": "date",
                 "nullable": True},
                {"apiName": "externalId", "physicalName": "external_id",
                 "type": "uuid"},
                {"apiName": "managerId", "physicalName": "manager_id",
                 "type": "int", "nullable": True},
            ],
            "relations": [
                {"column": "managerId",
                 "references": {"table": "samples", "column": "id"},
                 "type": "many-to-one"},
            ],
        },
        {
            "id": "sampleItems", "apiName": "sampleItems", "database": "pg-main",
            "physicalName": "sample_items", "primaryKey": ["id"],
            "columns": [
                {"apiName": "id", "physicalName": "id", "type": "int"},
                {"apiName": "sampleId", "physicalName": "sample_id", "type": "int"},
                {"apiName": "label", "physicalName": "label", "type": "string"},
                {"apiName": "category", "physicalName": "category",
                 "type": "string"},
                {"apiName": "amount", "physicalName": "amount", "type": "decimal"},
                {"apiName": "quantity", "physicalName": "quantity", "type": "int"},
                {"apiName": "status", "physicalName": "status", "type": "string"},
            ],
            "relations": [
                {"column": "sampleId",
                 "references": {"table": "samples", "column": "id"},
                 "type": "many-to-one"},
            ],
        },
        {
            "id": "sampleDetails", "apiName": "sampleDetails",
            "database": "pg-main", "physicalName": "sample_details",
            "primaryKey": ["id"],
            "columns": [
                {"apiName": "id", "physicalName": "id", "type": "int"},
                {"apiName": "sampleItemId", "physicalName": "sample_item_id",
                 "type": "int"},
                {"apiName": "info", "physicalName": "info", "type": "string",
                 "nullable": True},
            ],
            "relations": [
                {"column": "sampleItemId",
                 "references": {"table": "sampleItems", "column": "id"},
                 "type": "many-to-one"},
            ],
        },
        {
            "id": "orders", "apiName": "orders", "database": "pg-main",
            "physicalName": "orders", "primaryKey": ["id"],
            "columns": [
                {"apiName": "id", "physicalName": "id", "type": "int"},
                {"apiName": "customerId", "physicalName": "customer_id",
                 "type": "uuid", "maskingFn": "uuid"},
                {"apiName": "productId", "physicalName": "product_id",
                 "type": "uuid", "nullable": True},
                {"apiName": "total", "physicalName": "total_amount",
                 "type": "decimal", "maskingFn": "number"},
                {"apiName": "discount", "physicalName": "discount",
                 "type": "decimal", "nullable": True},
                {"apiName": "status", "physicalName": "order_status",
                 "type": "string"},
                {"apiName": "internalNote", "physicalName": "internal_note",
                 "type": "string", "nullable": True, "maskingFn": "full"},
                {"apiName": "createdAt", "physicalName": "created_at",
                 "type": "timestamp", "maskingFn": "date"},
                {"apiName": "quantity", "physicalName": "quantity", "type": "int"},
                {"apiName": "isPaid", "physicalName": "is_paid",
                 "type": "boolean", "nullable": True},
                {"apiName": "priorities", "physicalName": "priorities",
                 "type": "int[]", "nullable": True},
            ],
            "relations": [
                {"column": "customerId",
                 "references": {"table": "users", "column": "id"},
                 "type": "many-to-one"},
                {"column": "productId",
                 "references": {"table": "products", "column": "id"},
                 "type": "many-to-one"},
            ],
        },
        {
            "id": "products", "apiName": "products", "database": "pg-main",
            "physicalName": "products", "primaryKey": ["id"],
            "columns": [
                {"apiName": "id", "physicalName": "id", "type": "uuid"},
                {"apiName": "name", "physicalName": "name", "type": "string"},
                {"apiName": "category", "physicalName": "category",
                 "type": "string"},
                {"apiName": "price", "physicalName": "price", "type": "decimal",
                 "maskingFn": "number"},
                {"apiName": "labels", "physicalName": "labels",
                 "type": "string[]", "nullable": True},
            ],
        },
        {
            "id": "users", "apiName": "users", "database": "pg-main",
            "physicalName": "users", "primaryKey": ["id"],
            "columns": [
                {"apiName": "id", "physicalName": "id", "type": "uuid"},
                {"apiName": "email", "physicalName": "email", "type": "string",
                 "maskingFn": "email"},
                {"apiName": "phone", "physicalName": "phone", "type": "string",
                 "nullable": True, "maskingFn": "phone"},
                {"apiName": "firstName", "physicalName": "first_name",
                 "type": "string", "maskingFn": "name"},
                {"apiName": "lastName", "physicalName": "last_name",
                 "type": "string", "maskingFn": "name"},
                {"apiName": "role", "physicalName": "role", "type": "string"},
                {"apiName": "age", "physicalName": "age", "type": "int",
                 "nullable": True},
                {"apiName": "managerId", "physicalName": "manager_id",
                 "type": "uuid", "nullable": True},
                {"apiName": "createdAt", "physicalName": "created_at",
                 "type": "timestamp"},
            ],
            "relations": [
                {"column": "managerId",
                 "references": {"table": "users", "column": "id"},
                 "type": "many-to-one"},
            ],
        },
        {
            "id": "invoices", "apiName": "invoices", "database": "pg-main",
            "physicalName": "invoices", "primaryKey": ["id"],
            "columns": [
                {"apiName": "id", "physicalName": "id", "type": "uuid"},
                {"apiName": "orderId", "physicalName": "order_id", "type": "int",
                 "nullable": True},
                {"apiName": "amount", "physicalName": "amount", "type": "decimal",
                 "maskingFn": "number"},
                {"apiName": "status", "physicalName": "status", "type": "string"},
                {"apiName": "issuedAt", "physicalName": "issued_at",
                 "type": "timestamp"},
                {"apiName": "paidAt", "physicalName": "paid_at",
                 "type": "timestamp", "nullable": True},
                {"apiName": "dueDate", "physicalName": "due_date", "type": "date",
                 "nullable": True},
            ],
            "relations": [
                {"column": "orderId",
                 "references": {"table": "orders", "column": "id"},
                 "type": "many-to-one"},
            ],
        },
        {
            "id": "events", "apiName": "events", "database": "ch-analytics",
            "physicalName": "events", "primaryKey": ["id"],
            "columns": [
                {"apiName": "id", "physicalName": "id", "type": "uuid"},
                {"apiName": "type", "physicalName": "event_type",
                 "type": "string"},
                {"apiName": "userId", "physicalName": "user_id", "type": "uuid"},
                {"apiName": "orderId", "physicalName": "order_id", "type": "int",
                 "nullable": True},
                {"apiName": "payload", "physicalName": "payload", "type": "string",
                 "nullable": True, "maskingFn": "full"},
                {"apiName": "tags", "physicalName": "tags", "type": "string[]",
                 "nullable": True},
                {"apiName": "timestamp", "physicalName": "event_ts",
                 "type": "timestamp"},
            ],
            "relations": [
                {"column": "userId",
                 "references": {"table": "users", "column": "id"},
                 "type": "many-to-one"},
                {"column": "orderId",
                 "references": {"table": "orders", "column": "id"},
                 "type": "many-to-one"},
            ],
        },
        {
            "id": "orderItems", "apiName": "orderItems", "database": "pg-main",
            "physicalName": "order_items",
            "primaryKey": ["orderId", "productId"],  # composite → byIds rejected
            "columns": [
                {"apiName": "orderId", "physicalName": "order_id", "type": "int"},
                {"apiName": "productId", "physicalName": "product_id",
                 "type": "uuid"},
                {"apiName": "quantity", "physicalName": "quantity", "type": "int"},
                {"apiName": "unitPrice", "physicalName": "unit_price",
                 "type": "decimal"},
            ],
            "relations": [
                {"column": "orderId",
                 "references": {"table": "orders", "column": "id"},
                 "type": "many-to-one"},
                {"column": "productId",
                 "references": {"table": "products", "column": "id"},
                 "type": "many-to-one"},
            ],
        },
    ],
    "externalSyncs": [
        {"sourceTable": "orders", "targetDatabase": "ch-analytics",
         "targetPhysicalName": "orders_replica", "estimatedLag": "seconds"},
    ],
    "caches": [
        {"id": "redis-main", "engine": "memory",
         "tables": [{"tableId": "users", "keyPattern": "users:{id}"}]},
    ],
}

ROLES = [
    {"id": "admin", "tables": "*"},
    {
        "id": "tenant-user",
        "tables": [
            {"tableId": "orders",
             "allowedColumns": ["id", "total", "status", "createdAt"],
             "maskedColumns": ["total"]},
            {"tableId": "users",
             "allowedColumns": ["id", "firstName", "lastName", "email"],
             "maskedColumns": ["email"]},
            {"tableId": "products",
             "allowedColumns": ["id", "name", "category", "price"]},
        ],
    },
    {
        "id": "analyst",
        "tables": [
            {"tableId": "orders",
             "allowedColumns": ["id", "total", "status", "internalNote",
                                "createdAt", "customerId"],
             "maskedColumns": ["internalNote", "createdAt", "customerId"]},
            {"tableId": "users",
             "allowedColumns": ["id", "firstName", "lastName", "email", "phone"],
             "maskedColumns": ["phone", "firstName", "lastName"]},
            {"tableId": "products",
             "allowedColumns": ["id", "name", "category", "price"],
             "maskedColumns": ["price"]},
            {"tableId": "invoices",
             "allowedColumns": ["id", "orderId", "amount", "status"],
             "maskedColumns": ["amount"]},
        ],
    },
    {
        "id": "viewer",
        "tables": [
            {"tableId": "orders",
             "allowedColumns": ["id", "status", "createdAt", "quantity"]},
            {"tableId": "users", "allowedColumns": ["id", "firstName"]},
        ],
    },
    {"id": "no-access", "tables": []},
    {
        "id": "orders-service",
        "tables": [
            {"tableId": "orders", "allowedColumns": "*"},
            {"tableId": "products", "allowedColumns": "*"},
            {"tableId": "users",
             "allowedColumns": ["id", "firstName", "lastName"]},
        ],
    },
    {
        "id": "reporting-service",
        "tables": [
            {"tableId": "orders",
             "allowedColumns": ["id", "total", "status", "createdAt"],
             "maskedColumns": ["total"]},
            {"tableId": "products", "allowedColumns": "*"},
        ],
    },
]

SAMPLES_ROWS = [
    (1, "Alpha", "alpha@test.com", "electronics", dec("100.00"), dec("10.00"),
     "active", ["fast", "new"], [1, 2], True, "note-1",
     ts("2024-01-15T10:00:00Z"), d("2024-02-20"), "uuid-s1", None),
    (2, "Beta", "beta@test.com", "clothing", dec("200.00"), None, "paid",
     ["slow"], [3], True, None, ts("2024-02-20T14:30:00Z"), d("2024-03-25"),
     "uuid-s2", 1),
    (3, "Gamma", "gamma@test.com", "electronics", dec("50.00"), dec("5.00"),
     "cancelled", ["fast"], None, False, "note-3", ts("2024-03-10T08:15:00Z"),
     None, "uuid-s3", 1),
    (4, "Delta", "delta@test.com", "food", dec("300.00"), None, "active",
     None, [], None, None, ts("2024-04-05T16:45:00Z"), d("2024-05-01"),
     "uuid-s4", None),
    (5, "Epsilon", "epsilon@test.com", "electronics", dec("150.00"),
     dec("0.00"), "shipped", ["fast", "slow", "new"], [1, 2, 3], True,
     "note-5", ts("2024-05-12T12:00:00Z"), d("2024-06-15"), "uuid-s5", 2),
]

SAMPLE_ITEMS_ROWS = [
    (1, 1, "item-A", "electronics", dec("25.00"), 2, "active"),
    (2, 1, "item-B", "clothing", dec("120.00"), 1, "active"),
    (3, 2, "item-C", "clothing", dec("40.00"), 5, "paid"),
    (4, 3, "item-D", "electronics", dec("60.00"), 3, "cancelled"),
    (5, 5, "item-E", "food", dec("10.00"), 1, "active"),
    (6, 5, "item-F", "electronics", dec("20.00"), 2, "paid"),
]

SAMPLE_DETAILS_ROWS = [
    (1, 1, "detail-1"),
    (2, 2, None),
    (3, 3, "detail-3"),
    (4, 5, "detail-4"),
]

ORDERS_ROWS = [
    (1, "uuid-c1", "uuid-p1", dec("100.00"), dec("10.00"), "active",
     "internal-1", ts("2024-01-15T10:00:00Z"), 2, True, [1, 2]),
    (2, "uuid-c2", "uuid-p2", dec("200.00"), None, "paid", None,
     ts("2024-02-20T14:30:00Z"), 5, True, [3]),
    (3, "uuid-c1", "uuid-p1", dec("50.00"), dec("5.00"), "cancelled",
     "internal-3", ts("2024-03-10T08:15:00Z"), 1, False, None),
    (4, "uuid-c3", None, dec("300.00"), None, "active", None,
     ts("2024-04-05T16:45:00Z"), 10, None, []),
    (5, "uuid-c2", "uuid-p3", dec("150.00"), dec("0.00"), "shipped",
     "internal-5", ts("2024-05-12T12:00:00Z"), 3, True, [1, 2, 3]),
]

PRODUCTS_ROWS = [
    ("uuid-p1", "Widget A", "electronics", dec("25.00"), ["sale", "new"]),
    ("uuid-p2", "Widget B", "clothing", dec("40.00"), ["clearance"]),
    ("uuid-p3", "Widget C", "electronics", dec("15.00"), None),
]

USERS_ROWS = [
    ("uuid-c1", "alice@example.com", "+1234567890", "Alice", "Smith",
     "admin", 30, None, ts("2023-01-01T00:00:00Z")),
    ("uuid-c2", "bob@example.com", None, "Bob", "Jones", "viewer", 25,
     "uuid-c1", ts("2023-06-15T00:00:00Z")),
    ("uuid-c3", "carol@example.com", "+9876543210", "Carol", "Williams",
     "viewer", None, "uuid-c1", ts("2024-01-01T00:00:00Z")),
]

INVOICES_ROWS = [
    ("uuid-i1", 1, dec("100.00"), "paid", ts("2024-01-20T00:00:00Z"),
     ts("2024-01-25T00:00:00Z"), d("2024-02-20")),
    ("uuid-i2", 2, dec("200.00"), "pending", ts("2024-02-25T00:00:00Z"),
     None, d("2024-03-25")),
    ("uuid-i3", 1, dec("50.00"), "paid", ts("2024-01-22T00:00:00Z"),
     ts("2024-01-28T00:00:00Z"), None),
]

EVENTS_ROWS = [
    ("uuid-e1", "purchase", "uuid-c1", 1, '{"action":"buy"}',
     ["urgent", "vip"], ts("2024-01-15T10:05:00Z")),
    ("uuid-e2", "view", "uuid-c2", None, None, None,
     ts("2024-02-20T14:00:00Z")),
    ("uuid-e3", "purchase", "uuid-c1", 3, '{"action":"buy"}', ["urgent"],
     ts("2024-03-10T08:20:00Z")),
]

ORDER_ITEMS_ROWS = [
    (1, "uuid-p1", 2, dec("25.00")),
    (1, "uuid-p2", 1, dec("40.00")),
    (2, "uuid-p2", 5, dec("40.00")),
    (5, "uuid-p3", 3, dec("15.00")),
]

_ROWS = {
    "samples": SAMPLES_ROWS,
    "sample_items": SAMPLE_ITEMS_ROWS,
    "sample_details": SAMPLE_DETAILS_ROWS,
    "orders": ORDERS_ROWS,
    "products": PRODUCTS_ROWS,
    "users": USERS_ROWS,
    "invoices": INVOICES_ROWS,
    "events": EVENTS_ROWS,
    "order_items": ORDER_ITEMS_ROWS,
}


def _schema(table: TableMeta) -> T.StructType:
    return T.StructType(
        [
            T.StructField(c.physical_name, spark_type(c.type), True)
            for c in table.columns
        ]
    )


def build_registry(spark: SparkSession) -> SourceRegistry:
    meta = Metadata.from_dict(METADATA)
    dfs_by_db: dict[str, dict] = {"pg-main": {}, "ch-analytics": {}}
    for t in meta.tables:
        rows = _ROWS[t.physical_name]
        df = spark.createDataFrame(rows, schema=_schema(t))
        dfs_by_db[t.database][t.physical_name] = df
    # CDC replica of orders in ch-analytics (identical data, lag 'seconds')
    orders_meta = next(t for t in meta.tables if t.id == "orders")
    dfs_by_db["ch-analytics"]["orders_replica"] = spark.createDataFrame(
        ORDERS_ROWS, schema=_schema(orders_meta)
    )
    return SourceRegistry(
        {db: MemorySource(tables) for db, tables in dfs_by_db.items()}
    )
