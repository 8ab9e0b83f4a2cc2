"""Warehouse storage: parquet tables (orders/pipeline_runs/
data_quality_metrics), exports, summary reports (S7-S12, A8)."""

from .warehouse import Warehouse  # noqa: F401
