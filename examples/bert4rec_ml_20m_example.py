"""End-to-end training example on ML-20M
(reference examples/bert4rec_ml_20m_example.py)."""

from examples._common import run_training_example


def main():
    run_training_example(
        dataset="ml_20m",
        encoder_config="ml-20m_128",
        epochs=150,
        batch_size=256,
        input_duplication_factor=5,
        finetuning_split=0.1,
        save_name="bert4rec_ml-20m_128",
    )


if __name__ == "__main__":
    main()
