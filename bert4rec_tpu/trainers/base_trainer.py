"""Abstract trainer (reference ``bert4rec/trainers/base_trainer.py:9-51``)."""

import abc
import datetime


class BaseTrainer(abc.ABC):

    def __init__(self, model):
        self.model = model
        self.optimizer = None
        self.loss = None
        self.metrics = None
        self.callbacks = []

    @abc.abstractmethod
    def initialize_model(self, *args, **kwargs):
        ...

    @abc.abstractmethod
    def train(self, *args, **kwargs):
        ...

    @abc.abstractmethod
    def validate(self, *args, **kwargs):
        ...

    def update_wrapper_meta_info(self, wrapper, dataloader=None) -> None:
        """Stamp last_trained + trained_on_dataset (reference :40-44)."""
        updated_info = {
            "last_trained": datetime.datetime.now().strftime(
                "%Y-%m-%d %H:%M:%S"),
        }
        if dataloader is not None:
            updated_info["trained_on_dataset"] = dataloader.dataset_identifier
        wrapper.update_meta(updated_info)

    def append_callback(self, callback) -> None:
        """reference :50-51"""
        if callback is None:
            raise ValueError("The provided callback is None and can therefore "
                             "not be appended")
        self.callbacks.append(callback)
