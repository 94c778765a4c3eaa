"""Recommender app usage (reference examples/recommender_app_example.py):
load a saved ML-1M model and recommend the next movie for a history."""

import pathlib
import sys

from bert4rec_tpu.apps import Recommender
from bert4rec_tpu.dataloaders import get_dataloader_factory
from bert4rec_tpu.models import BERT4RecModelWrapper
from examples._common import fallback_titles


def main(save_path: str = "bert4rec_ml-1m_128"):
    wrapper, extras = BERT4RecModelWrapper.load(pathlib.Path(save_path))
    dataloader = get_dataloader_factory("bert4rec").create_ml_1m_dataloader(
        tokenizer=extras.get("tokenizer"))

    recommender = Recommender(wrapper.model, wrapper.params, dataloader)
    history = [
        "Toy Story (1995)",
        "Aladdin (1992)",
        "Lion King, The (1994)",
    ]
    history = fallback_titles(extras, history)
    print("history:", history)
    print("recommendation:", recommender(history))


if __name__ == "__main__":
    main(*sys.argv[1:])
