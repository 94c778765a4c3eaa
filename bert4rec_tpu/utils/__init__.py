from bert4rec_tpu.utils.utils import (
    get_project_root,
    get_virtual_env_path,
    get_data_dir,
    get_default_model_save_path,
    load_json_config,
)
from bert4rec_tpu.utils.checkpoint import load_pytree, save_pytree
from bert4rec_tpu.utils.profiling import StepTimer, hard_sync, trace

__all__ = [
    "get_project_root",
    "get_virtual_env_path",
    "get_data_dir",
    "get_default_model_save_path",
    "load_json_config",
    "load_pytree",
    "save_pytree",
    "StepTimer",
    "hard_sync",
    "trace",
]
