"""Shared synthetic fixtures (mirrors reference tests/test_utils.py:8-56)."""

import random
import string
from typing import List, Optional

import numpy as np

from bert4rec_tpu.dataloaders.sequence_dataset import SequenceDataset


def generate_random_word_list(n_words: int = 100,
                              word_length: int = 8,
                              seed: Optional[int] = None) -> List[str]:
    """Unique random words (the synthetic 'item catalogue')."""
    rng = random.Random(seed)
    words = set()
    while len(words) < n_words:
        words.add("".join(rng.choices(string.ascii_lowercase, k=word_length)))
    return sorted(words)


def generate_random_sequence_dataset(n_sequences: int = 50,
                                     min_len: int = 5,
                                     max_len: int = 40,
                                     vocab: Optional[List[str]] = None,
                                     seed: Optional[int] = None) -> SequenceDataset:
    """Ragged random item sequences — the de-facto fake backend for
    model/eval/preprocessor tests."""
    rng = random.Random(seed)
    vocab = vocab or generate_random_word_list(seed=seed)
    seqs = []
    for _ in range(n_sequences):
        length = rng.randint(min_len, max_len)
        seqs.append([rng.choice(vocab) for _ in range(length)])
    return SequenceDataset(seqs)


def generate_tokenized_dataset(n_sequences: int = 50,
                               min_len: int = 5,
                               max_len: int = 40,
                               vocab_size: int = 100,
                               n_special: int = 3,
                               seed: Optional[int] = None):
    """Random already-tokenized int sequences (ids in [n_special, vocab_size))."""
    rng = np.random.default_rng(seed)
    seqs = []
    for _ in range(n_sequences):
        length = int(rng.integers(min_len, max_len + 1))
        seqs.append(rng.integers(n_special, vocab_size,
                                 size=length).astype(np.int32))
    return seqs
