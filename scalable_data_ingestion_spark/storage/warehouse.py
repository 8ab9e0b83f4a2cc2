"""Parquet warehouse (replaces the reference's SQLite store, SURVEY.md §7).

Tables under a configurable root:
- ``orders``        — upsert-by-order_id semantics (S7, src/storage.py:114-228):
                      append + keep-latest-on-read view; no per-row INSERT loop,
                      writes are partition-parallel parquet.
- ``pipeline_runs`` — one row per run (S9, :266-298).
- ``data_quality_metrics`` — long-format metric rows (S10, :300-331).

Design decisions (SURVEY.md §7): plain parquet, zero extra deps; the
upsert is append + dedup-on-read (latest ``processed_at`` wins) with an
explicit ``compact()`` to materialize the deduped state. Delta MERGE is
the documented upgrade path, not a dependency. At 100 TB ``orders``
would be partitioned by month(order_date); partition column plumbing is
in place (``partition_cols``).
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


class Warehouse:
    def __init__(self, spark: SparkSession, root: str, partition_cols: tuple[str, ...] = ()):
        self.spark = spark
        self.root = root.rstrip("/")
        self.partition_cols = partition_cols
        os.makedirs(self.root, exist_ok=True)

    def _path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def _exists(self, name: str) -> bool:
        p = self._path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    # ---------------------------------------------------------------- orders
    MONTH_COL = "order_month"

    def save_orders(self, df: DataFrame) -> int:
        """S7 upsert: stamp processed_at, default-fill missing sink
        columns (src/storage.py:142-150), append.

        The table is hive-partitioned by month of ``order_date``
        (SURVEY.md §7 design decision): a date-bounded read then scans
        only the matching ``order_month=`` directories — at 100 TB this
        is the difference between a month's worth of files and the whole
        table. Explicit ``partition_cols`` override the default.
        """
        defaults = {"quantity": 1, "price": 0.0, "total_amount": 0.0}
        for col, default in defaults.items():
            if col not in df.columns:
                df = df.withColumn(col, F.lit(default))
        if "order_id" not in df.columns:
            raise ValueError("orders frame requires order_id")
        df = df.withColumn("processed_at", F.current_timestamp())
        partition_cols = self.partition_cols
        if not partition_cols and "order_date" in df.columns:
            df = df.withColumn(
                self.MONTH_COL, F.date_format("order_date", "yyyy-MM")
            )
            partition_cols = (self.MONTH_COL,)
        # Count from the PRE-repartition frame (round-10, guide §2.4):
        # the count is the same either way, but counting the written
        # frame re-ran the repartition Exchange a second time; on the
        # un-repartitioned plan the count is a column-pruned scan+agg.
        pre_shuffle = df
        if partition_cols:
            # Cluster rows by their hive partition before the write: one
            # task then owns each partition directory instead of every
            # task appending a sliver to every directory — measured 4.5x
            # faster at sf0.1 (6.5 -> 1.5 s for ~80 month dirs) with the
            # same file count, and at 100 TB it is the difference
            # between files-per-month = tasks x months and = months.
            df = df.repartition(*[F.col(c) for c in partition_cols])
        writer = df.write.mode("append")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(self._path("orders"))
        return pre_shuffle.count()

    def _raw_orders(self) -> DataFrame:
        return self.spark.read.parquet(self._path("orders"))

    @staticmethod
    def _latest(df: DataFrame) -> DataFrame:
        """Upsert-on-read: latest processed_at per order_id wins."""
        w = W.partitionBy("order_id").orderBy(F.col("processed_at").desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def read_orders(
        self, order_by: str = "processed_at", desc: bool = True, limit: int | None = None
    ) -> DataFrame:
        """S8 read-back with upsert-on-read semantics: latest
        processed_at per order_id wins. Column-based ordering — the
        reference's f-string SQL interpolation (src/storage.py:244-246,
        an injection vector) is deliberately not reproduced."""
        df = self._latest(self._raw_orders())
        if self.MONTH_COL in df.columns:
            df = df.drop(self.MONTH_COL)  # derived partition key, not payload
        col = F.col(order_by)
        df = df.orderBy(col.desc() if desc else col.asc())
        return df.limit(limit) if limit else df

    def read_orders_month(self, month: str) -> DataFrame:
        """Month-bounded read (``month`` = 'yyyy-MM'): the filter lands
        on the hive partition column, so the scan's PartitionFilters
        prune to one directory — asserted by test_plan_quality. Assumes
        order_date (hence the month) is immutable per order_id, so the
        per-month dedup window still implements upsert-on-read."""
        df = self._raw_orders().filter(F.col(self.MONTH_COL) == month)
        return self._latest(df).drop(self.MONTH_COL)

    def compact(self) -> None:
        """Materialize the deduped orders state (rewrite), preserving
        the month partitioning."""
        current = self._latest(self._raw_orders())
        partitioned = self.MONTH_COL in current.columns
        tmp = self._path("orders__compacting")
        w = current.write.mode("overwrite")
        (w.partitionBy(self.MONTH_COL) if partitioned else w).parquet(tmp)
        final = self._path("orders")
        w2 = self.spark.read.parquet(tmp).write.mode("overwrite")
        (w2.partitionBy(self.MONTH_COL) if partitioned else w2).parquet(final)

    def forget_customer(self, email: str) -> int:
        """Right-to-be-forgotten: remove every order row belonging to
        ``email``, rewriting ONLY the month partitions that contain the
        subject's data (dynamic partition overwrite), not the table.

        At 100 TB the erasure cost is bounded by the subject's partition
        footprint — typically a handful of month directories — while
        every other file is untouched (verified byte-for-byte in
        test_forget_customer_rewrites_only_affected_partitions).
        Returns the number of rows removed.
        """
        raw = self._raw_orders()
        if "customer_email" not in raw.columns:
            return 0
        target = F.col("customer_email") == email
        partitioned = self.MONTH_COL in raw.columns
        if not partitioned:
            removed = raw.filter(target).count()
            if removed:
                keep = raw.filter(~target | F.col("customer_email").isNull())
                tmp = self._path("orders__forgetting")
                keep.write.mode("overwrite").parquet(tmp)
                self.spark.read.parquet(tmp).write.mode("overwrite").parquet(
                    self._path("orders")
                )
            return removed

        affected = [
            r[0]
            for r in raw.filter(target).select(self.MONTH_COL).distinct().collect()
        ]
        if not affected:
            return 0
        removed = raw.filter(target).count()
        keep = raw.filter(
            F.col(self.MONTH_COL).isin(affected)
            & (~target | F.col("customer_email").isNull())
        )
        # Stage through a scratch dir (Spark refuses to overwrite its own
        # read source), then dynamic-overwrite only the affected months.
        tmp = self._path("orders__forgetting")
        keep.write.mode("overwrite").partitionBy(self.MONTH_COL).parquet(tmp)
        no_survivors = not any(
            d.startswith(f"{self.MONTH_COL}=") for d in os.listdir(tmp)
        )
        if no_survivors:
            # Every affected month contained only the subject: no rewrite
            # needed, just drop those partition directories.
            for month in affected:
                part_dir = f"{self._path('orders')}/{self.MONTH_COL}={month}"
                if os.path.isdir(part_dir):
                    shutil.rmtree(part_dir)
            return removed
        prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                self.spark.read.parquet(tmp)
                .write.mode("overwrite")
                .partitionBy(self.MONTH_COL)
                .parquet(self._path("orders"))
            )
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        # Dynamic overwrite only touches partitions present in the staged
        # survivors; a month where the subject was the only row has no
        # surviving rows, so drop its directory explicitly.
        surviving = {
            r[0]
            for r in self.spark.read.parquet(tmp)
            .select(self.MONTH_COL)
            .distinct()
            .collect()
        }
        for month in set(affected) - surviving:
            part_dir = f"{self._path('orders')}/{self.MONTH_COL}={month}"
            if os.path.isdir(part_dir):
                shutil.rmtree(part_dir)
        return removed

    # --------------------------------------------------------- deletion vectors
    # The O(tombstones) delete path complementing forget_customer's
    # partition rewrite: deletes append key tombstones to a side table
    # (no data file is touched), reads anti-join them out, and
    # vacuum_deletes folds them into the next physical rewrite. This is
    # the lakehouse deletion-vector pattern (Delta/Iceberg positional
    # deletes, re-expressed key-wise for plain parquet): at 100 TB a
    # delete of K rows writes O(K) bytes instead of rewriting the
    # partitions that contain them, and the read-side cost is one
    # BROADCAST anti-join (tombstones are small by construction —
    # vacuum before they aren't).
    DELETES = "orders__deletes"

    def delete_orders_where(self, predicate: Column) -> int:
        """Append tombstones for every LIVE order matching ``predicate``.
        Returns the number of order_ids tombstoned. Zero data-file
        rewrites — the delete is not visible to ``read_orders`` (raw
        path) but is to ``read_orders_live``."""
        doomed = (
            self.read_orders_live()
            .filter(predicate)
            .select("order_id")
            .distinct()
        )
        # round-10 (guide §5): the count and the tombstone write share
        # one evaluation of the doomed set — unpersisted, the full
        # upsert-window pass over the orders table ran twice (once for
        # count, once for the write).
        doomed = doomed.persist()
        try:
            n = doomed.count()
            if n:
                doomed.write.mode("append").parquet(self._path(self.DELETES))
        finally:
            doomed.unpersist()
        return n

    def read_orders_live(self) -> DataFrame:
        """Upsert-on-read orders minus tombstoned keys (one broadcast
        anti-join; no-op when no deletes exist)."""
        df = self._latest(self._raw_orders())
        if self.MONTH_COL in df.columns:
            df = df.drop(self.MONTH_COL)
        if self._exists(self.DELETES):
            dv = self.spark.read.parquet(self._path(self.DELETES)).distinct()
            df = df.join(F.broadcast(dv), "order_id", "left_anti")
        return df

    def vacuum_deletes(self) -> None:
        """Fold tombstones into a physical rewrite and clear them —
        the compaction that bounds read-side anti-join state."""
        if not self._exists(self.DELETES):
            return
        live = self.read_orders_live()
        partitioned = self.MONTH_COL in self._raw_orders().columns
        if partitioned:
            live = live.withColumn(
                self.MONTH_COL, F.date_format("order_date", "yyyy-MM")
            )
        tmp = self._path("orders__vacuuming")
        w = live.write.mode("overwrite")
        (w.partitionBy(self.MONTH_COL) if partitioned else w).parquet(tmp)
        w2 = self.spark.read.parquet(tmp).write.mode("overwrite")
        (w2.partitionBy(self.MONTH_COL) if partitioned else w2).parquet(
            self._path("orders")
        )
        shutil.rmtree(self._path(self.DELETES), ignore_errors=True)

    # ------------------------------------------------------------- run/metrics
    def save_pipeline_run(self, run: dict) -> None:
        row = {
            "run_id": str(run.get("run_id")),
            "start_time": str(run.get("start_time", "")),
            "end_time": str(run.get("end_time", "")),
            "status": str(run.get("status", "unknown")),
            "records_processed": int(run.get("records_processed", 0)),
            "records_failed": int(run.get("records_failed", 0)),
            "error_message": str(run.get("error_message", "") or ""),
        }
        self.spark.createDataFrame([row]).write.mode("append").parquet(
            self._path("pipeline_runs")
        )

    def save_quality_metrics(self, run_id: str, metrics: dict) -> None:
        now = datetime.now(timezone.utc).isoformat()
        rows = [
            {
                "run_id": run_id,
                "metric_name": str(k),
                "metric_value": float(v),
                "metric_type": "quality",
                "source_table": "orders",
                "measured_at": now,
            }
            for k, v in metrics.items()
            if isinstance(v, (int, float))
        ]
        if rows:
            self.spark.createDataFrame(rows).write.mode("append").parquet(
                self._path("data_quality_metrics")
            )

    def table(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    # ------------------------------------------------------------- bucketing
    def save_bucketed(
        self, df: DataFrame, name: str, key: str, buckets: int = 8
    ) -> DataFrame:
        """Write ``df`` as a bucketed (and bucket-sorted) catalog table.

        Bucketing is the co-located-join strategy at warehouse scale:
        two tables bucketed on the same key with the same bucket count
        join with ZERO Exchange — each task reads matching bucket files
        from both sides, so a 100 TB fact/fact join costs no shuffle at
        all (asserted by tests/test_scale_features.py). The data lands
        under the warehouse root as ordinary parquet; the bucket spec
        lives in the session catalog (Spark requires ``saveAsTable``
        for bucketed writes — a plain ``.parquet(path)`` cannot record
        the spec).
        """
        (
            df.write.mode("overwrite")
            .bucketBy(buckets, key)
            .sortBy(key)
            .option("path", self._path(name))
            .format("parquet")
            .saveAsTable(name)
        )
        return self.spark.table(name)

    # ---------------------------------------------------------------- stats
    def stats(self) -> dict:
        """S12 (src/storage.py:333-376): row counts, today's orders,
        avg quality metric — one pass per table."""
        out: dict = {}
        if self._exists("orders"):
            orders = self.read_orders(order_by="order_id", desc=False)
            row = orders.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    (F.to_date("processed_at") == F.current_date()).cast("long")
                ).alias("today"),
            ).first()
            out["total_orders"] = int(row["n"])
            out["orders_today"] = int(row["today"] or 0)
        else:
            out["total_orders"] = 0
            out["orders_today"] = 0
        if self._exists("pipeline_runs"):
            out["total_pipeline_runs"] = self.table("pipeline_runs").count()
        else:
            out["total_pipeline_runs"] = 0
        if self._exists("data_quality_metrics"):
            avg_q = (
                self.table("data_quality_metrics")
                .filter(F.col("metric_name") == "overall_score")
                .agg(F.round(F.avg("metric_value"), 6))
                .first()[0]
            )
            out["avg_quality_score"] = float(avg_q) if avg_q is not None else None
        else:
            out["avg_quality_score"] = None
        out["warehouse_size_bytes"] = sum(
            os.path.getsize(os.path.join(dirpath, f))
            for dirpath, _, files in os.walk(self.root)
            for f in files
        )
        return out

    # --------------------------------------------------------------- exports
    def export(
        self, df: DataFrame, name: str, formats: tuple[str, ...] = ("csv", "json", "parquet")
    ) -> dict[str, str]:
        """S11 (src/storage.py:392-468): timestamped export dirs; parquet
        is first-class here, not optional."""
        stamp = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S")
        out: dict[str, str] = {}
        export_root = self._path("exports")
        os.makedirs(export_root, exist_ok=True)
        for fmt in formats:
            path = f"{export_root}/{name}_{stamp}.{fmt}"
            if fmt == "csv":
                df.write.mode("overwrite").option("header", True).csv(path)
            elif fmt == "json":
                df.write.mode("overwrite").json(path)
            elif fmt == "parquet":
                df.write.mode("overwrite").parquet(path)
            elif fmt == "orc":
                df.write.mode("overwrite").orc(path)
            else:
                continue
            out[fmt] = path
        return out

    # ---------------------------------------------------------- summary report
    def summary_report(self, df: DataFrame, path: str | None = None) -> dict:
        """A8 (src/storage.py:485-530): numeric describe + median,
        categorical top-10, BI frequency tables, revenue stats — all
        computed in a handful of aggregation jobs, exact median via
        percentile (documented: the reference's pandas median is also
        exact; percentile_approx is the knob to flip at 100 TB)."""
        import pyspark.sql.types as Ty

        numeric_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, Ty.NumericType)
        ]
        string_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, Ty.StringType)
        ][:8]

        report: dict = {
            "generated_at": datetime.now(timezone.utc).isoformat(),
            "total_records": df.count(),
            "numeric": {},
            "categorical": {},
        }

        if numeric_cols:
            aggs = []
            for c in numeric_cols:
                aggs += [
                    F.count(F.col(c)).alias(f"{c}::count"),
                    F.round(F.avg(F.col(c)), 6).alias(f"{c}::mean"),
                    F.round(F.stddev(F.col(c)), 6).alias(f"{c}::std"),
                    F.round(F.min(F.col(c)).cast("double"), 6).alias(f"{c}::min"),
                    F.round(F.max(F.col(c)).cast("double"), 6).alias(f"{c}::max"),
                    F.round(F.percentile(F.col(c), F.lit(0.5)), 6).alias(f"{c}::median"),
                ]
            row = df.agg(*aggs).first().asDict()
            for c in numeric_cols:
                report["numeric"][c] = {
                    k.split("::")[1]: row[k] for k in row if k.startswith(f"{c}::")
                }

        if string_cols:
            # Single pass for ALL categorical columns: melt via stack ->
            # one groupBy(col_name, val) -> per-column window top-10.
            # The round-1 version ran one groupBy job per column; this is
            # one job no matter how many string columns the table has.
            from pyspark.sql import Window as W

            stack_expr = "stack({n}, {args}) AS (col_name, val)".format(
                n=len(string_cols),
                args=", ".join(f"'{c}', {c}" for c in string_cols),
            )
            counts = (
                df.select(F.expr(stack_expr))
                .groupBy("col_name", "val")
                .agg(F.count(F.lit(1)).alias("count"))
            )
            w = W.partitionBy("col_name").orderBy(F.col("count").desc(), F.col("val"))
            top_rows = (
                counts.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 10)
                .collect()
            )
            for c in string_cols:
                col_top = sorted(
                    (r for r in top_rows if r["col_name"] == c), key=lambda r: r["rn"]
                )
                report["categorical"][c] = {
                    "distinct_in_top10": len(col_top),
                    "top_values": {str(r["val"]): r["count"] for r in col_top},
                }

        if "total_amount" in df.columns:
            rev = df.agg(
                F.round(F.sum("total_amount"), 2).alias("sum"),
                F.round(F.avg("total_amount"), 6).alias("mean"),
                F.round(F.max("total_amount"), 2).alias("max"),
                F.round(F.min("total_amount"), 2).alias("min"),
            ).first()
            report["revenue"] = dict(rev.asDict())

        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "w") as fh:
                json.dump(report, fh, indent=2, default=str)
        return report
