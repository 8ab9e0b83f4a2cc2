"""4-stage pipeline orchestrator (X1-X5, src/pipeline.py:43-459).

Stage policy mirrored exactly (src/pipeline.py:110, 126-132, 142, 157):
ingestion / transformation / storage failures abort the run; a
validation failure only warns and the pipeline continues.

Spark-first execution shape (SURVEY.md §3): stages compose *lazy*
DataFrame transforms; the run triggers exactly three actions —
(1) the single-pass quality agg, (2) the warehouse write, (3) the
summary-report aggs — with ``persist()`` across the multi-action
boundary instead of the reference's four full materialized copies.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.cleaning import clean
from ..operators.enrichment import enrich
from ..operators.standardize import standardize
from ..quality import quality_scores, validate_schema
from ..sources.files import collect_all
from ..storage import Warehouse
from .config import Config


@dataclass
class StageResult:
    success: bool
    records: int = 0
    execution_time: float = 0.0
    error_message: str | None = None
    metadata: dict = field(default_factory=dict)


@dataclass
class PipelineResult:
    run_id: str
    success: bool = False
    stages_completed: list[str] = field(default_factory=list)
    stages_failed: list[str] = field(default_factory=list)
    stage_results: dict[str, StageResult] = field(default_factory=dict)
    records_processed: int = 0
    quality: dict = field(default_factory=dict)
    start_time: str = ""
    end_time: str = ""
    total_time: float = 0.0
    error_message: str | None = None


class PipelineManager:
    def __init__(self, spark: SparkSession, config: Config | None = None):
        self.spark = spark
        self.config = config or Config()
        self.warehouse = Warehouse(spark, self.config.get("warehouse.root"))
        self.enable_validation = True
        self.enable_transformation = True
        self.enable_storage = True

    # ------------------------------------------------------------------ run
    def run_pipeline(self, api_limit: int = 100, run_name: str | None = None) -> PipelineResult:
        run_id = run_name or f"RUN-{datetime.now(timezone.utc):%Y%m%d%H%M%S}-{uuid.uuid4().hex[:8]}"
        result = PipelineResult(run_id=run_id, start_time=datetime.now(timezone.utc).isoformat())
        t0 = time.monotonic()
        current: DataFrame | None = None

        # -- ingest (abort on failure, src/pipeline.py:110)
        t = time.monotonic()
        try:
            current = collect_all(
                self.spark,
                input_dir=self.config.get("files.input_dir"),
                api_limit=api_limit,
                offline_api=bool(self.config.get("api.offline", True)),
            ).persist()
            n = current.count()
            result.stage_results["ingestion"] = StageResult(True, n, time.monotonic() - t)
            result.stages_completed.append("ingestion")
            result.records_processed = n
        except Exception as exc:  # noqa: BLE001
            result.stage_results["ingestion"] = StageResult(
                False, 0, time.monotonic() - t, str(exc)
            )
            result.stages_failed.append("ingestion")
            result.error_message = f"ingestion failed: {exc}"
            result.end_time = datetime.now(timezone.utc).isoformat()
            result.total_time = time.monotonic() - t0
            self._persist_run(result)
            return result

        # -- validate (warn-only on failure, src/pipeline.py:126-132)
        if self.enable_validation:
            t = time.monotonic()
            try:
                schema_res = validate_schema(current)
                scores = quality_scores(current)
                result.quality = scores
                result.stage_results["validation"] = StageResult(
                    True,
                    result.records_processed,
                    time.monotonic() - t,
                    metadata={
                        "schema_errors": schema_res.errors,
                        "schema_warnings": schema_res.warnings,
                        **scores,
                    },
                )
                result.stages_completed.append("validation")
            except Exception as exc:  # noqa: BLE001
                result.stage_results["validation"] = StageResult(
                    False, 0, time.monotonic() - t, str(exc)
                )
                result.stages_failed.append("validation")  # continue anyway

        # -- transform (abort on failure, src/pipeline.py:142)
        if self.enable_transformation:
            t = time.monotonic()
            try:
                transformed = current
                if self.config.get("transformation.enable_cleaning", True):
                    transformed = clean(transformed)
                if self.config.get("transformation.enable_enrichment", True):
                    transformed = enrich(transformed)
                if self.config.get("transformation.enable_standardization", True):
                    transformed = standardize(transformed)
                current.unpersist()
                current = transformed.persist()
                n = current.count()
                result.stage_results["transformation"] = StageResult(
                    True, n, time.monotonic() - t
                )
                result.stages_completed.append("transformation")
                result.records_processed = n
            except Exception as exc:  # noqa: BLE001
                result.stage_results["transformation"] = StageResult(
                    False, 0, time.monotonic() - t, str(exc)
                )
                result.stages_failed.append("transformation")
                result.error_message = f"transformation failed: {exc}"
                result.end_time = datetime.now(timezone.utc).isoformat()
                result.total_time = time.monotonic() - t0
                self._persist_run(result)
                return result

        # -- store (abort on failure, src/pipeline.py:157; success if any
        # of db/export/report succeeded, src/storage.py:653)
        if self.enable_storage:
            t = time.monotonic()
            ops_ok = 0
            errors: list[str] = []
            try:
                self.warehouse.save_orders(current)
                ops_ok += 1
            except Exception as exc:  # noqa: BLE001
                errors.append(f"save: {exc}")
            try:
                self.warehouse.export(current, "orders", formats=("csv", "parquet"))
                ops_ok += 1
            except Exception as exc:  # noqa: BLE001
                errors.append(f"export: {exc}")
            try:
                self.warehouse.summary_report(
                    current, path=f"{self.warehouse.root}/reports/summary_{run_id}.json"
                )
                ops_ok += 1
            except Exception as exc:  # noqa: BLE001
                errors.append(f"report: {exc}")

            stage_ok = ops_ok >= 1
            result.stage_results["storage"] = StageResult(
                stage_ok,
                result.records_processed,
                time.monotonic() - t,
                "; ".join(errors) or None,
                metadata={"operations_succeeded": ops_ok},
            )
            (result.stages_completed if stage_ok else result.stages_failed).append("storage")
            if not stage_ok:
                result.error_message = "storage failed: " + "; ".join(errors)

        current.unpersist()
        result.success = not result.stages_failed or result.stages_failed == ["validation"]
        result.end_time = datetime.now(timezone.utc).isoformat()
        result.total_time = time.monotonic() - t0
        self._persist_run(result)
        return result

    # ------------------------------------------------------- persistence (X2)
    def _persist_run(self, result: PipelineResult) -> None:
        try:
            self.warehouse.save_pipeline_run(
                {
                    "run_id": result.run_id,
                    "start_time": result.start_time,
                    "end_time": result.end_time,
                    "status": "success" if result.success else "failed",
                    "records_processed": result.records_processed,
                    "records_failed": 0,
                    "error_message": result.error_message,
                }
            )
            if result.quality:
                self.warehouse.save_quality_metrics(result.run_id, result.quality)
        except Exception:  # noqa: BLE001 — run bookkeeping must not fail the run
            pass

    # ------------------------------------------------------------ status (X3)
    def status(self) -> dict:
        return {
            "warehouse": self.warehouse.stats(),
            "config": {
                "warehouse_root": self.config.get("warehouse.root"),
                "input_dir": self.config.get("files.input_dir"),
                "quality_threshold": self.config.get("data_quality.quality_threshold"),
            },
        }

    # ------------------------------------------------------------ health (X5)
    def health_check(self) -> dict:
        """Working health check (the reference's always-errors — SURVEY.md
        §2.11 X5 — because it calls a nonexistent method; this probes for
        real)."""
        from ..sources.api import ApiSource

        checks: dict[str, str] = {}
        try:
            self.spark.range(1).count()
            checks["spark"] = "healthy"
        except Exception:  # noqa: BLE001
            checks["spark"] = "unhealthy"
        api = ApiSource(
            base_url=self.config.get("api.base_url"),
            offline=bool(self.config.get("api.offline", True)),
        )
        checks["api"] = "healthy" if api.connectivity_ok() else "unhealthy"
        try:
            import os

            os.makedirs(self.warehouse.root, exist_ok=True)
            probe = f"{self.warehouse.root}/.health_probe"
            with open(probe, "w") as fh:
                fh.write("ok")
            os.remove(probe)
            checks["filesystem"] = "healthy"
        except Exception:  # noqa: BLE001
            checks["filesystem"] = "unhealthy"

        n_bad = sum(1 for v in checks.values() if v != "healthy")
        overall = "healthy" if n_bad == 0 else ("degraded" if n_bad == 1 else "unhealthy")
        return {"status": overall, "checks": checks}

    # ------------------------------------------------------------ report (X4)
    def markdown_report(self, result: PipelineResult) -> str:
        lines = [
            "# Pipeline Execution Report",
            "",
            f"- **Run ID**: {result.run_id}",
            f"- **Status**: {'SUCCESS' if result.success else 'FAILED'}",
            f"- **Records processed**: {result.records_processed}",
            f"- **Total time**: {result.total_time:.2f}s",
            f"- **Started**: {result.start_time}",
            f"- **Finished**: {result.end_time}",
            "",
            "## Stages",
            "",
        ]
        for name, sr in result.stage_results.items():
            status = "OK" if sr.success else f"FAILED ({sr.error_message})"
            lines.append(
                f"- **{name}**: {status} — {sr.records} records in {sr.execution_time:.2f}s"
            )
        if result.quality:
            lines += [
                "",
                "## Data quality",
                "",
                f"- Overall: {result.quality.get('overall_score')} "
                f"({result.quality.get('quality_level')})",
                f"- Completeness: {result.quality.get('completeness_score')}",
                f"- Validity: {result.quality.get('validity_score')}",
                f"- Consistency: {result.quality.get('consistency_score')}",
                f"- Accuracy: {result.quality.get('accuracy_score')}",
            ]
        if result.error_message:
            lines += ["", f"**Error**: {result.error_message}"]
        return "\n".join(lines)
