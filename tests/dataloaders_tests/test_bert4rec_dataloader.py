"""Dataloader end-to-end on a synthetic pandas source (contracts from
reference tests/datalaoders_tests/bert4rec_dataloaders_tests.py — the golden
vocab-size tests against real downloads are gated behind BERT4REC_TPU_RUN_DOWNLOADS)."""

import numpy as np
import pandas as pd
import pytest

from bert4rec_tpu import dataloaders
from bert4rec_tpu.dataloaders import BERT4RecDataloader
from bert4rec_tpu.dataloaders.processed_dataset import ProcessedDataset
from tests import test_utils


class FakeDataset:
    """In-memory stand-in for a BaseDataset (synthetic interaction log)."""

    _df = None

    @classmethod
    def load_data(cls):
        if cls._df is None:
            rng = np.random.default_rng(0)
            vocab = test_utils.generate_random_word_list(60, seed=0)
            rows = []
            t = 0
            for uid in range(40):
                for _ in range(int(rng.integers(3, 30))):
                    rows.append((uid, vocab[int(rng.integers(0, 60))], t))
                    t += 1
            cls._df = pd.DataFrame(rows,
                                   columns=["uid", "movie_name", "timestamp"])
        return cls._df


def make_loader(**kwargs):
    defaults = dict(max_seq_len=16, max_predictions_per_seq=4,
                    data_source=FakeDataset, masked_lm_prob=0.2,
                    input_duplication_factor=2, min_sequence_len=5)
    defaults.update(kwargs)
    return BERT4RecDataloader(**defaults)


def test_special_tokens_are_0_1_2():
    dl = make_loader()
    assert dl._PAD_TOKEN_ID == 0
    assert dl._MASK_TOKEN_ID == 1
    assert dl._UNK_TOKEN_ID == 2
    assert dl._SPECIAL_TOKEN_IDS == [0, 1, 2]


def test_factory_identity():
    factory = dataloaders.get_dataloader_factory("bert4rec")
    assert isinstance(factory, dataloaders.BERT4RecDataloaderFactory)
    dl = factory.create_ml_1m_dataloader()
    assert dl.dataset_identifier == "ml_1m"
    assert dl._MAX_SEQ_LENGTH == 200
    assert dl._MAX_PREDICTIONS_PER_SEQ == 40
    assert dl.input_duplication_factor == 10
    with pytest.raises(ValueError):
        dataloaders.get_dataloader_factory("nope")


def test_per_dataset_defaults():
    f = dataloaders.get_dataloader_factory()
    beauty = f.create_beauty_dataloader()
    assert (beauty._MAX_SEQ_LENGTH, beauty._MAX_PREDICTIONS_PER_SEQ) == (50, 30)
    assert beauty.masked_lm_prob == 0.6
    steam = f.create_steam_dataloader()
    assert (steam._MAX_SEQ_LENGTH, steam._MAX_PREDICTIONS_PER_SEQ) == (50, 20)
    assert steam.masked_lm_prob == 0.4
    reddit = f.create_reddit_dataloader()
    assert reddit.input_duplication_factor == 2
    ml20m = f.create_ml_20m_dataloader()
    assert ml20m.input_duplication_factor == 5


def test_bad_duplication_factor_raises():
    with pytest.raises(ValueError):
        make_loader(input_duplication_factor=0)


def test_load_data_loo_and_duplication():
    dl = make_loader()
    train, val, test = dl.load_data(sort_by="timestamp",
                                    extract_data=["movie_name"],
                                    group_by="uid")
    # duplication factor 2 on train only
    n_users = FakeDataset.load_data()["uid"].nunique()
    assert len(train) == 2 * n_users
    assert len(val) <= n_users and len(test) <= n_users
    # LOO: test sequences two longer than train (for long-enough users)
    assert len(test[0]) == len(train[0]) + 2


def test_get_data_finetuning_split_validation():
    dl = make_loader()
    with pytest.raises(ValueError):
        dl.get_data(extract_data=["movie_name"], group_by="uid",
                    finetuning_split=1.5)


def test_prepare_training_end_to_end():
    dl = make_loader()
    dl.generate_vocab(list(dict.fromkeys(
        FakeDataset.load_data()["movie_name"])))
    train, val, test = dl.get_data(
        sort_by="timestamp", extract_data=["movie_name"], group_by="uid",
        finetuning_split=0.1)
    assert isinstance(train, ProcessedDataset)
    feats = train.materialize(seed=0)
    n = train.cardinality()
    assert feats["input_word_ids"].shape == (n, 16)
    assert feats["masked_lm_positions"].shape == (n, 4)
    # the finetuning carve-out marks ~10% of train rows
    frac_ft = train.finetuning.mean()
    assert 0.0 < frac_ft < 0.2
    # val/test are all finetuning (last-item mask)
    assert val.finetuning.all() and test.finetuning.all()
    val_feats = val.materialize(seed=0)
    w = val_feats["masked_lm_weights"]
    assert (w.sum(axis=1) == 1).all()


def test_prepare_inference():
    dl = make_loader()
    vocab = list(dict.fromkeys(FakeDataset.load_data()["movie_name"]))
    dl.generate_vocab(vocab)
    features = dl.prepare_inference(vocab[:5])
    assert features["input_word_ids"].shape == (1, 16)
    assert features["input_word_ids"][0, 5] == dl._MASK_TOKEN_ID


def test_create_item_list_and_popularity():
    dl = make_loader()

    class Loader(BERT4RecDataloader):
        def create_item_list(self):
            return FakeDataset.load_data()["movie_name"].to_list()

        @property
        def dataset_identifier(self):
            return "fake"

    loader = Loader(max_seq_len=16, max_predictions_per_seq=4)
    items = loader.create_item_list()
    ranked = loader.create_popular_item_ranking()
    assert len(set(ranked)) == len(ranked)
    tokenized = loader.create_item_list_tokenized()
    assert len(tokenized) == len(items)
