"""End-to-end training example on Amazon Beauty
(reference examples/bert4rec_beauty_example.py)."""

from examples._common import run_training_example


def main():
    run_training_example(
        dataset="beauty",
        encoder_config="beauty_128",
        epochs=150,
        batch_size=256,
        input_duplication_factor=5,
        finetuning_split=0.1,
        save_name="bert4rec_beauty_128",
    )


if __name__ == "__main__":
    main()
