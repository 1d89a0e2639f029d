"""Core utilities: config, registries, disk cache, logging helpers."""

from .builder import get_module
from .config import Config, ConfigDict
from .dataset_helper import Cache, get_hash, make_dir
from .log import LogRecord, code2md, get_runid
from .registry import (DATASET, MODEL, PIPELINE, SAMPLER, Registry,
                       convert_device_name, convert_framework_name,
                       get_from_name)

__all__ = [
    "get_module", "Config", "ConfigDict", "Cache", "get_hash", "make_dir",
    "LogRecord", "code2md", "get_runid", "DATASET", "MODEL", "PIPELINE",
    "SAMPLER", "Registry", "convert_device_name", "convert_framework_name",
    "get_from_name",
]
