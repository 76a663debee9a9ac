"""Utility layer: config, checkpointing, logging, downloads, visualization.

Heavy submodules (visualization → matplotlib, download → urllib, setup →
the full stack) are intentionally NOT imported here; import them directly:
    from msid_tpu.utils import visualization, download, setup
"""

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
