"""Ingestion sources: REST API (S1-S3), CSV/JSON file drops (S4-S5),
multi-source union + dedup (S6)."""

from .api import ApiSource, posts_to_orders  # noqa: F401
from .files import read_csv_dir, read_json_dir, collect_all  # noqa: F401
