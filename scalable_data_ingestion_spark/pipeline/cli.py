"""CLI (X6, run_pipeline.py:263-330) — same flag surface:
--limit --no-validation --no-transformation --no-storage --report
--status --health --log-level --name, plus --config/--warehouse.

Usage: python -m scalable_data_ingestion_spark.pipeline.cli [flags]
"""

from __future__ import annotations

import argparse
import json
import sys

from ..session import get_spark
from .config import Config
from .manager import PipelineManager


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="PySpark data ingestion pipeline")
    p.add_argument("--limit", type=int, default=100, help="API record limit")
    p.add_argument("--no-validation", action="store_true")
    p.add_argument("--no-transformation", action="store_true")
    p.add_argument("--no-storage", action="store_true")
    p.add_argument("--report", action="store_true", help="print markdown report")
    p.add_argument("--status", action="store_true", help="print status and exit")
    p.add_argument("--health", action="store_true", help="health check and exit")
    p.add_argument("--log-level", default="WARN")
    p.add_argument("--name", default=None, help="run name")
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--warehouse", default=None, help="warehouse root override")
    p.add_argument(
        "--stream",
        action="store_true",
        help="drain the input dir via Structured Streaming (availableNow) "
        "instead of a batch run",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    overrides = {"warehouse": {"root": args.warehouse}} if args.warehouse else None
    config = Config(args.config, overrides=overrides)
    spark = get_spark(config.get("spark.app_name"))
    spark.sparkContext.setLogLevel(args.log_level)
    mgr = PipelineManager(spark, config)

    if args.status:
        print(json.dumps(mgr.status(), indent=2, default=str))
        return 0
    if args.health:
        health = mgr.health_check()
        print(json.dumps(health, indent=2))
        return 0 if health["status"] != "unhealthy" else 1

    if args.stream:
        from ..streaming.ingest import start_ingest

        input_dir = config.get("files.input_dir")
        root = config.get("warehouse.root")
        query = start_ingest(
            spark,
            input_dir,
            mgr.warehouse,
            checkpoint_dir=f"{root}/_checkpoints/ingest",
            archive_dir=config.get("files.processed_dir"),
            once=True,
        )
        query.awaitTermination()
        print(
            json.dumps(
                {"mode": "stream", "input_dir": input_dir, "status": "drained",
                 "warehouse": mgr.warehouse.stats()},
                indent=2, default=str,
            )
        )
        return 0

    mgr.enable_validation = not args.no_validation
    mgr.enable_transformation = not args.no_transformation
    mgr.enable_storage = not args.no_storage

    result = mgr.run_pipeline(api_limit=args.limit, run_name=args.name)
    print(
        json.dumps(
            {
                "run_id": result.run_id,
                "success": result.success,
                "records_processed": result.records_processed,
                "stages_completed": result.stages_completed,
                "stages_failed": result.stages_failed,
                "total_time_s": round(result.total_time, 3),
                "quality_level": result.quality.get("quality_level"),
                "overall_score": result.quality.get("overall_score"),
            },
            indent=2,
        )
    )
    if args.report:
        print()
        print(mgr.markdown_report(result))
    return 0 if result.success else 1


if __name__ == "__main__":
    sys.exit(main())
