"""JDBC upsert sink — the literal-capability twin of the reference's
SQLite store (`/root/reference/src/storage.py:164-205`, `INSERT OR
REPLACE INTO orders ... ON CONFLICT(order_id)`), re-expressed for a
real RDBMS behind Spark's JDBC writer.

Shape (no per-row driver loop, unlike the reference's row-at-a-time
executemany):

1. the batch lands in a staging table via ``df.write.jdbc`` —
   partition-parallel inserts, Spark's standard JDBC fan-out;
2. one set-based ``MERGE INTO orders USING staging ON order_id``
   statement (ANSI SQL:2003, supported by Derby 10.11+/Postgres
   15+/MySQL via upsert dialects) flips the upsert atomically on the
   database side;
3. staging is dropped.

Scale honesty: a single RDBMS is the right sink for DIMENSION-sized
curated outputs (the reference's entire use case — thousands of
orders), not for 100 TB facts; the parquet/warehouse path
(`storage/warehouse.py`) remains the scale sink, and this class exists
to close the reference's literal capability. Tests run against the
embedded Derby engine that ships inside pyspark's ``jars/`` directory,
so no extra dependency or network service is required; any other
JDBC URL + driver class works unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


class JdbcOrderStore:
    """Upsert-by-``order_id`` orders store over any JDBC database.

    ``url`` example (embedded Derby): ``jdbc:derby:/tmp/ordersdb;create=true``.
    """

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        driver: str = DERBY_DRIVER,
        table: str = "orders",
    ):
        self.spark = spark
        self.url = url
        self.driver = driver
        self.table = table

    # ------------------------------------------------------------- plumbing
    def _connect(self):
        """Driver-side JDBC connection (DDL + MERGE only — never row
        data; all row traffic goes through executor-parallel
        ``df.write.jdbc``)."""
        jvm = self.spark._jvm
        jvm.java.lang.Class.forName(self.driver)
        return jvm.java.sql.DriverManager.getConnection(self.url)

    def _execute(self, *statements: str) -> None:
        conn = self._connect()
        try:
            st = conn.createStatement()
            for sql in statements:
                st.execute(sql)
            st.close()
        finally:
            conn.close()

    def _table_exists(self, name: str) -> bool:
        conn = self._connect()
        try:
            rs = conn.getMetaData().getTables(None, None, name.upper(), None)
            found = rs.next()
            rs.close()
            return found
        finally:
            conn.close()

    # --------------------------------------------------------------- upsert
    def save_orders(self, df: DataFrame) -> int:
        """Upsert the batch by ``order_id``: last write wins, matching
        the reference's ``INSERT OR REPLACE`` semantics. Returns the
        number of rows written to staging."""
        if "order_id" not in df.columns:
            raise ValueError("orders frame requires order_id")
        # Batches can carry duplicate order_ids (multi-source union);
        # MERGE requires a unique source key. The reference's
        # row-at-a-time INSERT OR REPLACE makes the LAST occurrence of
        # a key win (src/storage.py:164-205) — but a DataFrame has no
        # row order, so "last" must come from the data: pick the winner
        # with a deterministic row_number over (order_id), ordered by
        # ingested_at DESC when the lineage column exists (true
        # last-write-wins), then every remaining column DESC as a total
        # tiebreak so conflicting duplicates never resolve by partition
        # luck.
        from pyspark.sql import Window, functions as F

        order_cols = [
            F.col(c).desc_nulls_last()
            for c in (
                ["ingested_at"] if "ingested_at" in df.columns else []
            )
            + [c for c in df.columns if c not in ("order_id", "ingested_at")]
        ]
        w = Window.partitionBy("order_id").orderBy(*order_cols)
        batch = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        staging = f"{self.table}_staging"
        props = {"driver": self.driver}
        # Derby maps StringType to CLOB by default, and CLOBs are not
        # comparable in a MERGE ON clause — pin strings to VARCHAR.
        varchars = ", ".join(
            f"{f.name} VARCHAR(4000)"
            for f in batch.schema.fields
            if f.dataType.typeName() == "string"
        )
        if varchars:
            props["createTableColumnTypes"] = varchars

        batch.write.mode("overwrite").format("jdbc").options(
            url=self.url, dbtable=staging, **props
        ).save()

        # Spark's JDBC writer creates case-sensitive quoted columns, so
        # every identifier in the MERGE must be quoted the same way.
        cols = batch.columns
        q = lambda c: f'"{c}"'  # noqa: E731
        collist = ", ".join(q(c) for c in cols)
        sets = ", ".join(
            f"t.{q(c)} = s.{q(c)}" for c in cols if c.lower() != "order_id"
        )
        vals = ", ".join(f"s.{q(c)}" for c in cols)
        if not self._table_exists(self.table):
            # First batch: the staging relation IS the initial state.
            self._execute(
                f"CREATE TABLE {self.table} AS SELECT * FROM {staging} "
                "WITH NO DATA",
                f"INSERT INTO {self.table} SELECT * FROM {staging}",
                f"DROP TABLE {staging}",
            )
            return batch.count()
        merge = (
            f"MERGE INTO {self.table} t USING {staging} s "
            f'ON t."order_id" = s."order_id" '
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({collist}) VALUES ({vals})"
        )
        self._execute(merge, f"DROP TABLE {staging}")
        return batch.count()

    # ---------------------------------------------------------------- reads
    def read_orders(self) -> DataFrame:
        """Read the current upserted state back as a DataFrame
        (executor-side JDBC scan; for a partitioned parallel read pass
        partitionColumn bounds through ``options``)."""
        return (
            self.spark.read.format("jdbc")
            .options(url=self.url, dbtable=self.table, driver=self.driver)
            .load()
        )

    def count(self) -> int:
        return self.read_orders().count()
