"""Shipped encoder configs (reference
``bert4rec/config/bert4rec_train_configs/*.json`` — 13 files, per-dataset x
hidden size 64/128/256, reddit only 128; keys ``attention_dropout,
output_dropout, hidden_size, inner_dim, max_sequence_length,
num_attention_heads, num_layers``)."""

import pathlib

from bert4rec_tpu.models.config import BERT4RecConfig
from bert4rec_tpu.utils.utils import load_json_config

CONFIG_DIR = pathlib.Path(__file__).parent / "bert4rec_train_configs"


def list_train_configs() -> list:
    return sorted(p.stem for p in CONFIG_DIR.glob("*.json"))


def load_train_config(name: str, vocab_size: int,
                      **overrides) -> BERT4RecConfig:
    """Load a shipped config by name (e.g. ``"ml-1m_128"``) into a
    :class:`BERT4RecConfig` (the reference splats the JSON into the encoder
    constructor, examples/bert4rec_ml_1m_example.py:42-45)."""
    path = CONFIG_DIR / f"{name}.json"
    if not path.is_file():
        raise FileNotFoundError(
            f"No shipped train config {name!r}; available: "
            f"{list_train_configs()}")
    return BERT4RecConfig.from_dict(load_json_config(path),
                                    vocab_size=vocab_size, **overrides)


__all__ = ["CONFIG_DIR", "list_train_configs", "load_train_config"]
