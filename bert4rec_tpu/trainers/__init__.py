"""Trainers: jitted train step, optax optimizers, callbacks."""

from bert4rec_tpu.trainers.base_trainer import BaseTrainer
from bert4rec_tpu.trainers.bert4rec_trainer import BERT4RecTrainer
from bert4rec_tpu.trainers import callbacks, optimizers, trainer_utils
from bert4rec_tpu.trainers.callbacks import (
    Callback, EarlyStopping, History, JSONLLogger, ModelCheckpoint,
)

trainers_map = {
    "bert4rec": BERT4RecTrainer,
}


def get(identifier="bert4rec", **kwargs):
    """Factory (reference trainers/__init__.py parity)."""
    if isinstance(identifier, BaseTrainer):
        return identifier
    if identifier in trainers_map:
        return trainers_map[identifier](**kwargs)
    raise ValueError(f"{identifier} is not a known trainer identifier!")


__all__ = ["BaseTrainer", "BERT4RecTrainer", "callbacks", "optimizers",
           "trainer_utils", "Callback", "EarlyStopping", "History",
           "ModelCheckpoint", "trainers_map", "get"]
