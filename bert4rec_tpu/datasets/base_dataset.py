"""Abstract raw dataset.

Same contract as reference ``bert4rec/datasets/base_dataset.py:9-61``:
classmethod-only API where ``load_data()`` orchestrates
``is_available() -> download() -> extract_data()`` and returns a
``pd.DataFrame``; ``load_n_records`` caps the number of records and
``set_load_n_records`` is daisy-chainable.
"""

import abc
import os
from typing import Optional

import pandas as pd


class BaseDataset(abc.ABC):
    # concrete classes set these
    source: Optional[str] = None   # download URL
    dest: Optional[str] = None     # destination directory/file under the data dir
    load_n_records: Optional[int] = None

    @classmethod
    def set_load_n_records(cls, n: Optional[int]):
        """Cap the number of records returned by ``load_data`` (chainable)."""
        cls.load_n_records = n
        return cls

    @classmethod
    def load_data(cls) -> pd.DataFrame:
        # global smoke knob: ``BERT4REC_TPU_LOAD_N_RECORDS=<n>`` caps every
        # dataset that was not capped explicitly — this is how the example
        # scripts (full-corpus API surface) run offline in the test suite
        # on a synthetic corpus in minutes instead of hours. Resolved per
        # CALL and restored afterwards (subclass extract_data streams with
        # nrows=cls.load_n_records, so the cap is applied for the call's
        # duration only): unsetting the env var must restore full-corpus
        # loads in the same process, not leave a stale cap in class state
        n_records = cls.load_n_records
        if n_records is None:
            env = os.environ.get("BERT4REC_TPU_LOAD_N_RECORDS")
            if env:
                n_records = int(env)
        saved = cls.load_n_records
        cls.load_n_records = n_records
        try:
            if not cls.is_available():
                cls.download()
            df = cls.extract_data()
            if n_records is not None:
                df = df.head(n_records)
        finally:
            cls.load_n_records = saved
        return df

    @classmethod
    @abc.abstractmethod
    def is_available(cls) -> bool:
        ...

    @classmethod
    @abc.abstractmethod
    def download(cls):
        ...

    @classmethod
    @abc.abstractmethod
    def extract_data(cls) -> pd.DataFrame:
        ...
