from bert4rec_tpu.utils.utils import (
    get_project_root,
    get_data_dir,
    get_default_model_save_path,
    load_json_config,
)

__all__ = [
    "get_project_root",
    "get_data_dir",
    "get_default_model_save_path",
    "load_json_config",
]
