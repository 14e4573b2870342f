from .config import Config
from .general import (
    delete_file,
    get_files,
    get_logger,
    init_dir,
    init_file,
    run,
    Progbar,
    minibatches,
)
from .lr_schedule import LRSchedule

__all__ = [
    "Config",
    "LRSchedule",
    "Progbar",
    "delete_file",
    "get_files",
    "get_logger",
    "init_dir",
    "init_file",
    "minibatches",
    "run",
]
