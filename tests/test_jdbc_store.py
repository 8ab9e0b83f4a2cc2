"""JDBC upsert sink (storage/jdbc_store.py) against embedded Derby —
the literal-capability twin of the reference's SQLite ``INSERT OR
REPLACE`` store (reference src/storage.py:164-205). Derby ships inside
pyspark's jars/, so this needs no extra dependency; if the driver
class is ever absent the suite skips rather than fails.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalable_data_ingestion_spark.storage.jdbc_store import JdbcOrderStore


@pytest.fixture
def store(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/ordersdb;create=true"
    s = JdbcOrderStore(spark, url)
    try:
        s._connect().close()
    except Exception as exc:  # pragma: no cover - environment-dependent
        pytest.skip(f"embedded Derby unavailable: {exc}")
    return s


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "order_id: string, customer_name: string, total_amount: double"
    )


def test_first_batch_creates_table(spark, store):
    n = store.save_orders(
        _orders(spark, [("A-0001", "Ann", 10.0), ("A-0002", "Bob", 20.0)])
    )
    assert n == 2
    assert store.count() == 2


def test_upsert_last_write_wins(spark, store):
    store.save_orders(
        _orders(spark, [("A-0001", "Ann", 10.0), ("A-0002", "Bob", 20.0)])
    )
    store.save_orders(
        _orders(spark, [("A-0002", "Bob", 99.0), ("A-0003", "Cyd", 30.0)])
    )
    state = {
        r["order_id"]: r["total_amount"] for r in store.read_orders().collect()
    }
    # reference semantics: conflict on order_id replaces the row
    assert state == {"A-0001": 10.0, "A-0002": 99.0, "A-0003": 30.0}


def test_batch_internal_duplicates_deterministic_winner(spark, store):
    # Conflicting duplicates within one batch resolve deterministically
    # (column-wise DESC tiebreak stands in for the reference's
    # "last occurrence wins", which a row-ordered SQLite loop gets for
    # free but an unordered DataFrame cannot): the 2.0 row survives,
    # never by partition luck.
    store.save_orders(
        _orders(
            spark,
            [("A-0001", "Ann", 1.0), ("A-0001", "Ann", 2.0)],
        )
    )
    assert store.count() == 1
    assert store.read_orders().collect()[0]["total_amount"] == 2.0


def test_batch_duplicates_prefer_ingested_at(spark, store):
    # When the lineage column exists it defines "last write": the most
    # recently ingested row wins even if other columns sort lower.
    df = spark.createDataFrame(
        [
            ("A-0009", "Ann", 9.0, "2024-01-02 00:00:00"),
            ("A-0009", "Ann", 1.0, "2024-01-03 00:00:00"),
        ],
        "order_id: string, customer_name: string, total_amount: double,"
        " ingested_at: string",
    ).withColumn("ingested_at", F.to_timestamp("ingested_at"))
    store.save_orders(df)
    assert store.read_orders().collect()[0]["total_amount"] == 1.0


def test_missing_order_id_rejected(spark, store):
    with pytest.raises(ValueError):
        store.save_orders(spark.createDataFrame([("x",)], ["customer_name"]))


def test_export_all_formats_round_trip(spark, tmp_path):
    # S11 export surface incl. the ORC path: every format writes and
    # reads back the same rows.
    from scalable_data_ingestion_spark.storage.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [("A-0001", 10.0), ("A-0002", 20.5)], "order_id: string, total: double"
    )
    out = wh.export(df, "orders", formats=("csv", "json", "parquet", "orc"))
    assert set(out) == {"csv", "json", "parquet", "orc"}
    for fmt, path in out.items():
        reader = getattr(spark.read, fmt)
        back = (
            spark.read.option("header", True)
            .option("inferSchema", True)
            .csv(path)
            if fmt == "csv"
            else reader(path)
        )
        assert back.count() == 2
        assert {r["order_id"] for r in back.collect()} == {"A-0001", "A-0002"}
