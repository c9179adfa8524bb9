from .joins import asof_join
from .quality import quality_report

__all__ = ["asof_join", "quality_report"]
