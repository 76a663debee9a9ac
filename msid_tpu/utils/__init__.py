"""Utility layer: config, checkpointing, logging, downloads, visualization."""

from msid_tpu.utils.config import (
    coerce_scheduler_params,
    get_project_root,
    load_config,
    merge_configs,
    print_config,
    save_config,
    validate_config,
)

__all__ = [
    "coerce_scheduler_params",
    "get_project_root",
    "load_config",
    "merge_configs",
    "print_config",
    "save_config",
    "validate_config",
]
