"""End-to-end training example on Reddit
(reference examples/bert4rec_reddit_example.py). The 335k-item vocab is the
one case where the vocab-sharded embedding/softmax pays: pass a mesh with
``model_parallelism > 1`` to shard it (core/mesh.py)."""

from examples._common import run_training_example


def main():
    run_training_example(
        dataset="reddit",
        encoder_config="reddit_128",
        epochs=150,
        batch_size=256,
        input_duplication_factor=2,
        finetuning_split=0.1,
        save_name="bert4rec_reddit_128",
    )


if __name__ == "__main__":
    main()
