"""Dataloader API tour (reference examples/dataloader_usage_example.py):
factory -> vocab -> LOO-split datasets -> fixed-shape feature batches."""

from bert4rec_tpu.dataloaders import get_dataloader_factory


def main():
    factory = get_dataloader_factory("bert4rec")
    dataloader = factory.create_ml_1m_dataloader()

    # vocab generation (tokenizes every distinct item string)
    dataloader.generate_vocab()
    tokenizer = dataloader.get_tokenizer()
    print("vocab size:", tokenizer.get_vocab_size())

    # leave-one-out split + MLM preprocessing
    train_ds, val_ds, test_ds = dataloader.prepare_training(
        finetuning_split=0.1)
    print("train/val/test sizes:",
          len(train_ds), len(val_ds), len(test_ds))

    # fixed-shape int32 feature batches, fresh masks per epoch seed
    batch = next(train_ds.batches(batch_size=256, seed=0))
    for name, arr in batch.items():
        print(f"  {name}: {arr.shape} {arr.dtype}")

    # single-sequence inference features
    items = dataloader.create_item_list()[:5]
    model_input = dataloader.prepare_inference(items)
    print("inference features:",
          {k: v.shape for k, v in model_input.items()})


if __name__ == "__main__":
    main()
