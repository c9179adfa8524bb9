from .cursor import CursorIncrementalIngest
from .pipelines import dedup_stream, run_to_memory, windowed_stream

__all__ = ["CursorIncrementalIngest", "dedup_stream", "run_to_memory", "windowed_stream"]
