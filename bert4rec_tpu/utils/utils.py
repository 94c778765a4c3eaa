"""Path and config helpers.

Capability parity with the reference's ``bert4rec/utils/utils.py`` (reference
utils.py:10-40) without its ``$VIRTUAL_ENV`` coupling: data and model paths are
anchored at the project root (overridable via ``BERT4REC_TPU_HOME``).
"""

import json
import os
import pathlib


def get_project_root() -> pathlib.Path:
    """Root directory for data/model artifacts.

    Override with the ``BERT4REC_TPU_HOME`` environment variable; defaults to
    the repository root (two levels above this file).
    """
    env = os.environ.get("BERT4REC_TPU_HOME")
    if env:
        return pathlib.Path(env)
    return pathlib.Path(__file__).resolve().parent.parent.parent


def get_virtual_env_path() -> pathlib.Path:
    """Reference API parity (utils.py:10): the active virtualenv if any,
    else the project root (this framework has no venv coupling)."""
    env = os.environ.get("VIRTUAL_ENV")
    if env:
        return pathlib.Path(env)
    return get_project_root()


def get_data_dir() -> pathlib.Path:
    return get_project_root() / "data"


def get_default_model_save_path() -> pathlib.Path:
    return get_project_root() / "saved_models"


def load_json_config(path: pathlib.Path) -> dict:
    """Load a JSON config file into a dict (reference utils.py:26-40)."""
    path = pathlib.Path(path)
    if not path.is_file():
        raise FileNotFoundError(f"Config file {path} does not exist.")
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)
