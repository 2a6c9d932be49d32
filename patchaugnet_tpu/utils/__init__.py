"""Utilities: meters, logging, timing, geometry helpers."""
from .meters import AverageMeter
from .timestamps import timestamp2str
from .logging_util import get_logger, MetricsWriter

__all__ = ["AverageMeter", "timestamp2str", "get_logger", "MetricsWriter"]
