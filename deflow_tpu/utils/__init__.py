from .timer import StageTimer
from .logger import MetricLogger
