"""String-item <-> sequential-integer-id tokenizer.

Same semantics as reference ``bert4rec/tokenizers/simple_tokenizer.py``:
ids assigned sequentially from 0 in first-seen order (simple_tokenizer.py:129-138),
``"key|id"`` vocab-file lines (:104-116), polymorphic tokenize/detokenize over
str/bytes/numbers/numpy arrays/pd.Series/iterables (:34-74), ``drop_tokens``
dropped on detokenize (:172-181).

TPU-native differences: no TF tensor types (numpy arrays instead); detokenize
uses an O(1) reverse dict instead of the reference's O(V) ``list.index`` scan;
array tokenize/detokenize is vectorized.
"""

import numbers
import os
import pathlib
from collections.abc import Iterable
from typing import Optional

import numpy as np

try:
    import pandas as pd
except ImportError:  # pragma: no cover - pandas is a baked-in dep
    pd = None

from bert4rec_tpu.tokenizers.base_tokenizer import BaseTokenizer


class SimpleTokenizer(BaseTokenizer):
    """Converts a string to a unique sequential (numerical) id."""

    def __init__(self, vocab_file_path: Optional[pathlib.Path] = None,
                 extensible: bool = True):
        self._vocab: dict = {}
        self._inverse_vocab: dict = {}
        self._delimiter = "|"
        super().__init__(vocab_file_path=vocab_file_path, extensible=extensible)

    @property
    def identifier(self) -> str:
        return "simple"

    def get_vocab(self) -> list:
        return list(self._vocab.keys())

    def clear_vocab(self):
        self._vocab = {}
        self._inverse_vocab = {}
        self._vocab_size = 0

    # ------------------------------------------------------------------ #
    # tokenize
    # ------------------------------------------------------------------ #

    def tokenize(self, input, progress_bar: bool = False):
        if isinstance(input, bytes):
            input = input.decode("utf-8")

        if isinstance(input, str):
            return self._tokenize_string(input)
        if isinstance(input, np.ndarray):
            return self._tokenize_array(input)
        if pd is not None and isinstance(input, pd.Series):
            if pd.api.types.infer_dtype(input, skipna=False) in (
                    "string", "bytes"):
                return pd.Series(self._tokenize_array(
                    input.to_numpy(dtype=object)), index=input.index)
            return input.map(self.tokenize)
        if isinstance(input, (list, tuple)) and input and all(
                isinstance(v, (str, bytes)) for v in input):
            # flat string sequences (the per-user item lists, item-list
            # sources) take the vectorized unique-then-map path
            return self._tokenize_array(
                np.asarray(input, dtype=object)).tolist()
        if isinstance(input, Iterable):
            return [self.tokenize(v) for v in input]
        raise ValueError(
            f"The provided argument of type {type(input)} is not supported")

    def _tokenize_string(self, string: str) -> int:
        if isinstance(string, bytes):
            string = string.decode("utf-8")
        token = self._vocab.get(string)
        if token is not None:
            return token
        if not self._extensible:
            raise RuntimeError(f'"{string}" is not known!')
        token = self._vocab_size
        self._vocab[string] = token
        self._inverse_vocab[token] = string
        self._vocab_size += 1
        return token

    def _tokenize_array(self, arr: np.ndarray):
        """Vectorized: tokenize each UNIQUE value once (new ids assigned in
        first-occurrence order, identical to the sequential scan), then map
        the whole array through the unique ids. Turns the O(elements)
        python loop into O(uniques) — the 20M-interaction ML-20M corpus
        has 26.7k uniques. ``pd.factorize`` (hash-based, first-seen order,
        C speed) rather than ``np.unique`` (sort-based: python-level
        compares on object arrays)."""
        flat = arr.reshape(-1)
        if flat.size == 0:
            return np.zeros(arr.shape, dtype=np.int32)
        if pd is None:  # pragma: no cover - pandas is a baked-in dep
            ids = [self.tokenize(v) for v in flat.tolist()]
            return np.array(ids, dtype=np.int32).reshape(arr.shape)
        codes, uniques = pd.factorize(flat)
        if codes.min() < 0:
            # factorize gives NaN/None code -1, which would silently alias
            # the last unique's id — fail loudly like the per-element path
            raise ValueError(
                "tokenize input contains null/NaN items; clean the item "
                "column before tokenizing")
        ids = np.asarray([self.tokenize(v) for v in uniques],
                         dtype=np.int32)
        return ids[codes].reshape(arr.shape)

    # ------------------------------------------------------------------ #
    # detokenize
    # ------------------------------------------------------------------ #

    def detokenize(self, token, drop_tokens: Optional[list] = None,
                   progress_bar: bool = False):
        if isinstance(token, np.ndarray):
            token = token.tolist()
        if isinstance(token, numbers.Number):
            return self._detokenize_token(int(token), drop_tokens)
        if pd is not None and isinstance(token, pd.Series):
            return token.map(lambda t: self.detokenize(t, drop_tokens))
        if isinstance(token, Iterable):
            values = [self.detokenize(t, drop_tokens) for t in token]
            return [v for v in values if v is not None]
        raise ValueError(
            f"The provided argument of type {type(token)} is not supported")

    def _detokenize_token(self, token: int, drop_tokens: Optional[list] = None):
        value = self._inverse_vocab.get(token)
        if drop_tokens and value in drop_tokens:
            return None
        return value

    # ------------------------------------------------------------------ #
    # vocab file I/O — "key|id" lines (reference simple_tokenizer.py:76-116)
    # ------------------------------------------------------------------ #

    def import_vocab_from_file(self, vocab_file: pathlib.Path) -> bool:
        vocab_file = pathlib.Path(vocab_file)
        if not vocab_file.is_file():
            raise RuntimeError(
                f"No vocab file found at {vocab_file}.")

        self.clear_vocab()
        with open(vocab_file, "rb") as f:
            lines = f.readlines()
        if len(lines) <= 0:
            raise ValueError(f"Vocab file {vocab_file} has no lines.")
        first = lines[0].decode("utf-8")
        if self._delimiter not in first:
            raise ValueError(
                f'Vocab file {vocab_file} is missing the '
                f'"{self._delimiter}" delimiter on its first line.')
        if len(first.rstrip("\r\n").split(self._delimiter)) != 2:
            raise ValueError(
                f'Each line of {vocab_file} must be exactly one '
                f'"{self._delimiter}"-delimited key/id pair.')

        for line in lines:
            text = line.decode("utf-8").rstrip("\r\n")
            if not text:
                continue
            key, _, value = text.rpartition(self._delimiter)
            token = int(value)
            self._vocab[key] = token
            self._inverse_vocab[token] = key

        self._vocab_size = len(self._vocab)
        return True

    def export_vocab_to_file(self, file_path: pathlib.Path) -> bool:
        if len(self._vocab) <= 0:
            raise ValueError(
                "The vocab of the tokenizer is empty and therefore can't be "
                "written to a file.")
        with open(file_path, "wb") as f:
            for key, token in self._vocab.items():
                f.write(f"{key}{self._delimiter}{token}{os.linesep}".encode("utf-8"))
        return True
