"""Schema validation (src/validation.py:336-424 SchemaValidator).

Tri-state semantics mirrored: missing required fields are ERRORS;
dtype mismatches and unexpected extra fields are WARNINGS only
(src/validation.py:388-405). Pure function over df.schema — no data
scan at all (the reference walks the frame; Spark already knows the
schema from the plan).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Expected dtypes (src/validation.py:373-380), translated to Spark types.
EXPECTED_TYPES: dict[str, tuple[type, ...]] = {
    "order_id": (T.StringType,),
    "customer_name": (T.StringType,),
    "customer_email": (T.StringType,),
    "product": (T.StringType,),
    "quantity": (T.LongType, T.IntegerType),
    "price": (T.DoubleType, T.FloatType),
    "total_amount": (T.DoubleType, T.FloatType),
    "order_date": (T.DateType, T.TimestampType, T.StringType),
    "source": (T.StringType,),
}

DEFAULT_REQUIRED = (
    "order_id",
    "customer_name",
    "product",
    "quantity",
    "price",
    "order_date",
)


@dataclass
class SchemaValidationResult:
    is_valid: bool
    errors: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)


def validate_schema(
    df: DataFrame, required_fields: tuple[str, ...] = DEFAULT_REQUIRED
) -> SchemaValidationResult:
    result = SchemaValidationResult(is_valid=True)
    present = {f.name: f.dataType for f in df.schema.fields}

    for name in required_fields:
        if name not in present:
            result.errors.append(f"missing required field: {name}")
            result.is_valid = False

    for name, expected in EXPECTED_TYPES.items():
        if name in present and not isinstance(present[name], expected):
            result.warnings.append(
                f"field {name}: expected {'/'.join(t.__name__ for t in expected)}, "
                f"got {type(present[name]).__name__}"
            )

    for name in present:
        if name not in EXPECTED_TYPES and not name.startswith(("source_file", "ingested_at", "_")):
            result.warnings.append(f"unexpected field: {name}")

    return result
