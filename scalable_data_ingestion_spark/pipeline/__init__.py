"""Pipeline orchestration: 4-stage manager, config, CLI (X1-X8)."""

from .config import Config  # noqa: F401
from .manager import PipelineManager, PipelineResult  # noqa: F401
