"""moc_tpu.utils — benchmarking, checkpointing, logging, profiling helpers."""

from moc_tpu.utils.benchmark import device_time

__all__ = ["device_time"]
