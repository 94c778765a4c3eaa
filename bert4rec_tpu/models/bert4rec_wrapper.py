"""BERT4Rec persistence wrapper.

Artifact contract mirrors the reference (bert4rec_wrapper.py:46-118) minus
Keras: a save directory contains

- ``weights.npz``          — the full param pytree (npz, path-keyed)
- ``encoder_config.json``  — :class:`BERT4RecConfig` (so load needs no code registry)
- ``meta_config.json``     — admin metadata incl. tokenizer identifier
- ``vocab.txt``            — tokenizer vocab (``key|id`` lines)

``save`` refuses to run on a wrapper holding no params — the analogue of the
reference's refusal to save un-built/un-compiled models
(reference bert4rec_wrapper.py:63-68). ``load`` restores model + params +
tokenizer from the directory alone (reference :85-118 needed a
``_custom_objects`` registry; the config file replaces it).
"""

import json
import pathlib
from typing import Optional, Union

from bert4rec_tpu import tokenizers
from bert4rec_tpu.models import model_utils
from bert4rec_tpu.models.bert4rec_model import BERT4RecModel
from bert4rec_tpu.models.config import BERT4RecConfig
from bert4rec_tpu.models.model_wrapper import ModelWrapper
from bert4rec_tpu.utils import checkpoint

WEIGHTS_FILE = "weights.npz"
ENCODER_CONFIG_FILE = "encoder_config.json"
META_CONFIG_FILE = "meta_config.json"
VOCAB_FILE = "vocab.txt"


class BERT4RecModelWrapper(ModelWrapper):

    def __init__(self, model: BERT4RecModel, params: Optional[dict] = None):
        super().__init__(model)
        self.params = params

    def update_params(self, params: dict) -> None:
        self.params = params

    # ------------------------------------------------------------------ #

    def save(self, save_path: Union[str, pathlib.Path],
             tokenizer: Optional[tokenizers.BaseTokenizer] = None,
             mode: int = 0) -> pathlib.Path:
        if self.params is None:
            raise RuntimeError(
                "The model can't be saved yet: no parameters attached. "
                "Initialize/train the model and call update_params first.")
        import jax
        save_path = model_utils.determine_model_path(save_path, mode)
        save_path.mkdir(parents=True, exist_ok=True)

        # multi-host: every process joins the weight gather inside
        # save_pytree, process 0 alone writes files (concurrent writers to
        # one shared-filesystem path would interleave), and the final
        # barrier makes the complete artifact visible to all before return
        multi_host = jax.process_count() > 1
        checkpoint.save_pytree(save_path / WEIGHTS_FILE, self.params)

        if tokenizer is not None:
            self.update_meta({"tokenizer": tokenizer.identifier})
        if not multi_host or jax.process_index() == 0:
            with open(save_path / ENCODER_CONFIG_FILE, "w") as f:
                json.dump(self.model.get_config(), f, indent=2)
            if tokenizer is not None:
                tokenizer.export_vocab_to_file(save_path / VOCAB_FILE)
            with open(save_path / META_CONFIG_FILE, "w") as f:
                json.dump(self._meta_config, f, indent=2)
        if multi_host:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"wrapper_save:{save_path}")
        return save_path

    # ------------------------------------------------------------------ #

    @classmethod
    def load(cls, save_path: Union[str, pathlib.Path],
             mode: int = 0) -> tuple:
        """Restore ``(wrapper, extras)`` where extras may hold ``tokenizer``
        (reference load signature parity, bert4rec_wrapper.py:85-118)."""
        save_path = model_utils.determine_model_path(save_path, mode)
        if not save_path.is_dir():
            raise FileNotFoundError(f"No saved model at {save_path}")

        with open(save_path / ENCODER_CONFIG_FILE) as f:
            config = BERT4RecConfig.from_dict(json.load(f))
        model = BERT4RecModel(config=config)

        # restore into a like-structured abstract target
        import jax
        target = jax.eval_shape(lambda: model.init(jax.random.key(0)))
        params = checkpoint.load_pytree(save_path / WEIGHTS_FILE, target)

        wrapper = cls(model, params)
        extras = {}
        meta_path = save_path / META_CONFIG_FILE
        if meta_path.is_file():
            with open(meta_path) as f:
                wrapper._meta_config = json.load(f)
            identifier = wrapper._meta_config.get("tokenizer")
            vocab_path = save_path / VOCAB_FILE
            if identifier and vocab_path.is_file():
                tokenizer = tokenizers.get(identifier)
                tokenizer.import_vocab_from_file(vocab_path)
                extras["tokenizer"] = tokenizer
        return wrapper, extras
