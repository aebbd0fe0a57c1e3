from .logger import AverageMeter, MetricLogger, SmoothedValue, make_logger
from .seeding import fold_in_name, seed_everything

__all__ = [
    "AverageMeter",
    "MetricLogger",
    "SmoothedValue",
    "make_logger",
    "fold_in_name",
    "seed_everything",
]
