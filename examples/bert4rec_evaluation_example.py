"""Standalone evaluation of a saved model
(reference examples/bert4rec_evaluation_example.py): load wrapper ->
rebuild dataloader -> sampled-negative HR/NDCG/MAP on the test split."""

import pathlib
import sys

from bert4rec_tpu.dataloaders import get_dataloader_factory
from bert4rec_tpu.evaluation import BERT4RecEvaluator
from bert4rec_tpu.models import BERT4RecModelWrapper


def main(save_path: str = "bert4rec_ml-1m_128"):
    wrapper, extras = BERT4RecModelWrapper.load(pathlib.Path(save_path))
    tokenizer = extras.get("tokenizer")

    factory = get_dataloader_factory("bert4rec")
    dataloader = factory.create_ml_1m_dataloader(tokenizer=tokenizer)
    if tokenizer is None:
        dataloader.generate_vocab()
    _, _, test_ds = dataloader.prepare_training(finetuning_split=0.1)

    evaluator = BERT4RecEvaluator(dataloader=dataloader)
    metrics = evaluator.evaluate(wrapper, test_ds=test_ds)
    print(metrics)
    evaluator.save_results(pathlib.Path(save_path))


if __name__ == "__main__":
    main(*sys.argv[1:])
