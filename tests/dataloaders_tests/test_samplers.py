"""Sampler behavior (reference samplers_tests/*)."""

import numpy as np
import pytest

from bert4rec_tpu.dataloaders import samplers

SOURCE = ["a"] * 50 + ["b"] * 30 + ["c"] * 15 + ["d"] * 4 + ["e"] * 1
VOCAB = ["a", "b", "c", "d", "e"]


def test_factory():
    assert isinstance(samplers.get("random"), samplers.RandomSampler)
    assert isinstance(samplers.get("popular"), samplers.PopularSampler)
    assert isinstance(samplers.get("pop_random"), samplers.PopularRandomSampler)
    assert isinstance(samplers.get("popular_random"),
                      samplers.PopularRandomSampler)
    s = samplers.get("random")
    assert samplers.get(s) is s
    with pytest.raises(ValueError):
        samplers.get("nope")


# --------------------------------------------------------------------------- #
# RandomSampler
# --------------------------------------------------------------------------- #

def test_random_sampler_size_and_no_duplicates():
    s = samplers.RandomSampler(vocab=list(range(100)), sample_size=10, seed=0)
    sample = s.sample()
    assert len(sample) == 10
    assert len(set(sample)) == 10


def test_random_sampler_without():
    s = samplers.RandomSampler(vocab=list(range(20)), sample_size=10, seed=0)
    without = list(range(10))
    sample = s.sample(without=without)
    assert set(sample) == set(range(10, 20))


def test_random_sampler_vocab_from_source():
    s = samplers.RandomSampler(source=SOURCE, sample_size=5, seed=0)
    assert set(s.sample()) == set(VOCAB)


def test_random_sampler_too_large_raises():
    s = samplers.RandomSampler(vocab=[1, 2, 3], sample_size=5)
    with pytest.raises(ValueError):
        s.sample()


# --------------------------------------------------------------------------- #
# PopularSampler
# --------------------------------------------------------------------------- #

def test_popular_sampler_deterministic_top_k():
    s = samplers.PopularSampler(source=SOURCE, sample_size=3)
    assert s.sample() == ["a", "b", "c"]


def test_popular_sampler_without():
    s = samplers.PopularSampler(source=SOURCE, sample_size=3)
    assert s.sample(without=["a"]) == ["b", "c", "d"]


# --------------------------------------------------------------------------- #
# PopularRandomSampler — default eval sampler
# --------------------------------------------------------------------------- #

def test_pop_random_probability_distribution():
    s = samplers.PopularRandomSampler(source=SOURCE, vocab=VOCAB,
                                      sample_size=2, seed=0)
    np.testing.assert_allclose(
        s.probability_distribution, [0.5, 0.3, 0.15, 0.04, 0.01])
    assert s.is_fully_prepared()


def test_pop_random_sample_size_and_exclusion():
    s = samplers.PopularRandomSampler(source=SOURCE, vocab=VOCAB,
                                      sample_size=2, seed=0)
    for _ in range(20):
        sample = s.sample(without=["a", "b"])
        assert len(sample) == 2
        assert "a" not in sample and "b" not in sample
        assert len(set(sample)) == 2


def test_pop_random_respects_popularity():
    s = samplers.PopularRandomSampler(source=SOURCE, vocab=VOCAB,
                                      sample_size=1, seed=0)
    counts = {v: 0 for v in VOCAB}
    for _ in range(2000):
        counts[s.sample()[0]] += 1
    assert counts["a"] > counts["c"] > counts["e"]


def test_pop_random_too_much_excluded_raises():
    s = samplers.PopularRandomSampler(source=SOURCE, vocab=VOCAB,
                                      sample_size=4, seed=0)
    with pytest.raises(ValueError):
        s.sample(without=["a", "b", "c"])


def test_pop_random_sample_size_larger_than_vocab_raises():
    s = samplers.PopularRandomSampler(source=SOURCE, vocab=VOCAB,
                                      sample_size=10, seed=0)
    with pytest.raises(ValueError):
        s.sample()


def test_pop_random_sample_batch():
    s = samplers.PopularRandomSampler(source=SOURCE, vocab=VOCAB,
                                      sample_size=2, seed=0)
    without_lists = [["a"], ["b"], []]
    idx = s.sample_batch(without_lists)
    assert idx.shape == (3, 2)
    # excluded indices never appear in their row
    assert 0 not in idx[0]
    assert 1 not in idx[1]
    # no duplicates within a row
    for row in idx:
        assert len(set(row.tolist())) == 2


def test_pop_random_unprepared():
    s = samplers.PopularRandomSampler(sample_size=5)
    assert not s.is_fully_prepared()
    with pytest.raises(ValueError):
        s.sample()
