"""Ranker app usage (reference examples/ranker_app_example.py): rank a
target movie (or candidate list) for a viewing history."""

import pathlib
import sys

from bert4rec_tpu.apps import Ranker
from bert4rec_tpu.dataloaders import get_dataloader_factory
from bert4rec_tpu.models import BERT4RecModelWrapper
from examples._common import fallback_titles


def main(save_path: str = "bert4rec_ml-1m_128"):
    wrapper, extras = BERT4RecModelWrapper.load(pathlib.Path(save_path))
    dataloader = get_dataloader_factory("bert4rec").create_ml_1m_dataloader(
        tokenizer=extras.get("tokenizer"))

    ranker = Ranker(wrapper.model, wrapper.params, dataloader)
    history = [
        "Toy Story (1995)",
        "Aladdin (1992)",
        "Lion King, The (1994)",
    ]
    candidates = ["Toy Story 2 (1999)", "GoldenEye (1995)", "Casino (1995)"]
    history, candidates = fallback_titles(extras, history, candidates)
    rank, text = ranker(history, rank_item=candidates[0])
    print(text)

    print(ranker(history, rank_items=candidates))


if __name__ == "__main__":
    main(*sys.argv[1:])
