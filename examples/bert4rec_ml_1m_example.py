"""Canonical end-to-end training example on ML-1M
(reference examples/bert4rec_ml_1m_example.py:14-95): 150 epochs, batch 256,
input duplication 5, finetuning split 0.1, ml-1m_128 encoder config."""

from examples._common import run_training_example


def main():
    run_training_example(
        dataset="ml_1m",
        encoder_config="ml-1m_128",
        epochs=150,
        batch_size=256,
        input_duplication_factor=5,
        finetuning_split=0.1,
        early_stopping_patience=20,
        save_name="bert4rec_ml-1m_128",
    )


if __name__ == "__main__":
    main()
