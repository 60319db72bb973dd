from .logging import MetricLogger  # noqa: F401
from .profiling import profile_trace, StepTimer  # noqa: F401
