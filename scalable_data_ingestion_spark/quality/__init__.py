"""Data-quality engine: weighted scoring, record counts, field profiles,
schema validation (reference parity for src/validation.py)."""

from .metrics import (  # noqa: F401
    QUALITY_WEIGHTS,
    field_profile,
    quality_level_expr,
    quality_scores,
    quality_scores_df,
    record_quality_counts,
)
from .schema_check import validate_schema  # noqa: F401
