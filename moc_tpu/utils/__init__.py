"""moc_tpu.utils — benchmarking, checkpointing, logging, profiling helpers."""

from moc_tpu.utils.benchmark import device_time
from moc_tpu.utils.device_cache import clear_device_cache, device_put_cached
from moc_tpu.utils.compile_cache import enable_compilation_cache
from moc_tpu.utils.export import load_serving_program, save_serving_program
from moc_tpu.utils.logging import AverageMeter, ScalarLogger

__all__ = ["device_time", "enable_compilation_cache", "AverageMeter", "ScalarLogger",
           "clear_device_cache", "device_put_cached",
           "load_serving_program", "save_serving_program"]
