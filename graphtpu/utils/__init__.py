from graphtpu.utils.logging import Log, StopWatch
from graphtpu.utils.metrics import StepMetrics, trace_profile

__all__ = ["Log", "StopWatch", "StepMetrics", "trace_profile"]
