"""End-to-end training example on Steam
(reference examples/bert4rec_steam_example.py)."""

from examples._common import run_training_example


def main():
    run_training_example(
        dataset="steam",
        encoder_config="steam_128",
        epochs=150,
        batch_size=256,
        input_duplication_factor=3,
        finetuning_split=0.1,
        save_name="bert4rec_steam_128",
    )


if __name__ == "__main__":
    main()
