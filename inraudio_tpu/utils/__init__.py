from .landscape import plot_landscape, random_plane
from .observability import (MetricsLogger, StepTimer, profile_trace,
                            read_metrics)

__all__ = [
    "random_plane", "plot_landscape",
    "MetricsLogger", "StepTimer", "profile_trace", "read_metrics",
]
