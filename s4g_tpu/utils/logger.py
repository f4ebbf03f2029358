"""Logging + windowed metric meters.

Same observability surface as the reference (reference:
inference/grasp_proposal/utils/logger.py:13-108): a stream+file logger and a
dict-of-windowed-averages MetricLogger, extended to accept jax arrays.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from collections import defaultdict, deque

import numpy as np


def setup_logger(name, save_dir, prefix="", timestamp=True):
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    ch = logging.StreamHandler(stream=sys.stdout)
    ch.setLevel(logging.INFO)
    formatter = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    ch.setFormatter(formatter)
    logger.addHandler(ch)

    if save_dir:
        ts = time.strftime(".%m_%d_%H_%M_%S") if timestamp else ""
        prefix = "." + prefix if prefix else ""
        log_file = os.path.join(save_dir, "log{}.txt".format(prefix + ts))
        fh = logging.FileHandler(log_file)
        fh.setLevel(logging.INFO)
        fh.setFormatter(formatter)
        logger.addHandler(fh)

    logger.propagate = False
    return logger


def shutdown_logger(logger):
    logger.handlers = []


class AverageMeter:
    """Track a series of values; expose windowed and global averages."""

    def __init__(self, window_size=20):
        self.values = deque(maxlen=window_size)
        self.counts = deque(maxlen=window_size)
        self.sum = 0.0
        self.count = 0

    def update(self, value, count=1):
        self.values.append(value)
        self.counts.append(count)
        self.sum += value
        self.count += count

    @property
    def avg(self):
        total = np.sum(self.counts)
        return 0 if total == 0 else np.sum(self.values) / total

    @property
    def global_avg(self):
        return 0 if self.count == 0 else self.sum / self.count


class MetricLogger:
    def __init__(self, delimiter="\t"):
        self.meters = defaultdict(AverageMeter)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            v = np.asarray(v)  # handles jax arrays, numpy, python scalars
            count = int(v.size)
            value = float(v.sum()) if count != 1 else float(v)
            self.meters[k].update(value, count)

    def __getattr__(self, attr):
        meters = object.__getattribute__(self, "meters")
        if attr in meters:
            return meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            "{}: Avg: {:.4f} Global Avg: {:.4f}".format(name, m.avg, m.global_avg)
            for name, m in self.meters.items())

    @property
    def summary_str(self):
        return self.delimiter.join(
            "{}: {:.4f}".format(name, m.global_avg) for name, m in self.meters.items())
