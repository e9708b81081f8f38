"""moc_tpu.utils — benchmarking, checkpointing, logging, profiling helpers."""

from moc_tpu.utils.benchmark import device_time
from moc_tpu.utils.logging import AverageMeter, ScalarLogger

__all__ = ["device_time", "AverageMeter", "ScalarLogger"]
