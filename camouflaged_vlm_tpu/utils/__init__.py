from .registry import Registry
from .logging import get_logger, log
from .timer import Timer, Averager
