from .logger import setup_logger, shutdown_logger, AverageMeter, MetricLogger
from . import math_utils
