"""Save / load round trip (reference
examples/bert4rec_save_and_load_example.py): wrapper.save -> directory of
weights.npz + encoder_config.json + meta_config.json + vocab.txt ->
BERT4RecModelWrapper.load restores model, params and tokenizer."""

import pathlib
import tempfile

import jax
import numpy as np

from bert4rec_tpu.dataloaders import BERT4RecDataloader
from bert4rec_tpu.models import (
    BERT4RecConfig, BERT4RecModel, BERT4RecModelWrapper,
)


def main():
    dataloader = BERT4RecDataloader(max_seq_len=16,
                                    max_predictions_per_seq=4)
    dataloader.generate_vocab([f"item_{i}" for i in range(40)])
    tokenizer = dataloader.get_tokenizer()

    config = BERT4RecConfig(vocab_size=tokenizer.get_vocab_size(),
                            hidden_size=32, num_layers=2,
                            num_attention_heads=4, inner_dim=64,
                            max_sequence_length=16,
                            max_predictions_per_seq=4)
    model = BERT4RecModel(config=config)
    params = model.init(jax.random.key(0))

    with tempfile.TemporaryDirectory() as td:
        save_path = pathlib.Path(td) / "bert4rec_demo"
        wrapper = BERT4RecModelWrapper(model, params)
        wrapper.save(save_path, tokenizer=tokenizer, mode=2)
        print("saved artifacts:", sorted(p.name for p in save_path.iterdir()))

        restored, extras = BERT4RecModelWrapper.load(save_path, mode=2)
        print("restored model config ==", restored.model.config == config)
        print("restored tokenizer vocab size:",
              extras["tokenizer"].get_vocab_size())

        batch = {
            "input_word_ids": np.full((1, 16), 5, np.int32),
            "input_mask": np.ones((1, 16), np.int32),
            "masked_lm_positions": np.array([[3]], np.int32),
        }
        a = model.apply(params, batch)["mlm_logits"]
        b = restored.model.apply(restored.params, batch)["mlm_logits"]
        print("identical outputs:", bool(np.array_equal(np.asarray(a),
                                                        np.asarray(b))))


if __name__ == "__main__":
    main()
