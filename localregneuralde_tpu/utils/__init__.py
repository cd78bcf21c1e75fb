from .profiling import PhaseTimer, trace

__all__ = ["PhaseTimer", "trace"]
