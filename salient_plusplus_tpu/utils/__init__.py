from .timing import Timer, RuntimeStats
from .logging import RunLogger

__all__ = ["Timer", "RuntimeStats", "RunLogger"]
