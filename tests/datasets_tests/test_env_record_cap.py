"""The BERT4REC_TPU_LOAD_N_RECORDS smoke cap must be resolved per
load_data() call — never baked into dataset class state — so unsetting
the env var restores full-corpus loads in the same process (self-review
r4: a long-lived service that ran one smoke call would otherwise
silently truncate every later load)."""

import pandas as pd
import pytest

from bert4rec_tpu.datasets.base_dataset import BaseDataset


class _Fake(BaseDataset):
    @classmethod
    def is_available(cls):
        return True

    @classmethod
    def download(cls):
        raise AssertionError("no download expected")

    @classmethod
    def extract_data(cls):
        # honor the streaming cap the way the real subclasses do
        # (pd.read_csv(..., nrows=cls.load_n_records))
        n = cls.load_n_records or 1000
        return pd.DataFrame({"uid": range(min(1000, n))})


@pytest.fixture(autouse=True)
def _reset():
    _Fake.load_n_records = None
    yield
    _Fake.load_n_records = None


def test_env_cap_applies_per_call_and_lifts(monkeypatch):
    monkeypatch.setenv("BERT4REC_TPU_LOAD_N_RECORDS", "7")
    assert len(_Fake.load_data()) == 7
    # the cap reached extract_data's streaming path for the call...
    assert _Fake.load_n_records is None  # ...but never stuck to the class
    monkeypatch.delenv("BERT4REC_TPU_LOAD_N_RECORDS")
    assert len(_Fake.load_data()) == 1000


def test_explicit_cap_still_wins_over_env(monkeypatch):
    monkeypatch.setenv("BERT4REC_TPU_LOAD_N_RECORDS", "7")
    _Fake.set_load_n_records(5)
    assert len(_Fake.load_data()) == 5
    assert _Fake.load_n_records == 5  # explicit caps persist by design


def test_cap_restored_even_when_extract_raises(monkeypatch):
    class _Boom(_Fake):
        @classmethod
        def extract_data(cls):
            raise RuntimeError("parse error")

    monkeypatch.setenv("BERT4REC_TPU_LOAD_N_RECORDS", "7")
    with pytest.raises(RuntimeError):
        _Boom.load_data()
    assert _Boom.load_n_records is None
