"""Offline dataset-utils tests (reference tests hit real downloads —
SURVEY.md §4; here everything network-free is covered, and the golden
vocab-size checks run only when the raw data is already on disk)."""

import pathlib
import tarfile
import zipfile

import pandas as pd
import pytest

from bert4rec_tpu.datasets import dataset_utils
from bert4rec_tpu.datasets.base_dataset import BaseDataset


class TestByteSizeChecks:

    def test_get_byte_size_file(self, tmp_path):
        f = tmp_path / "x.bin"
        f.write_bytes(b"a" * 1000)
        assert dataset_utils.get_byte_size(f) == 1000

    def test_get_byte_size_dir_recursive(self, tmp_path):
        (tmp_path / "sub").mkdir()
        (tmp_path / "a").write_bytes(b"a" * 10)
        (tmp_path / "sub" / "b").write_bytes(b"b" * 20)
        assert dataset_utils.get_byte_size(tmp_path) == 30

    def test_get_byte_size_missing(self, tmp_path):
        assert dataset_utils.get_byte_size(tmp_path / "nope") == -1

    def test_availability_within_tolerance(self, tmp_path):
        f = tmp_path / "x.bin"
        f.write_bytes(b"a" * 1000)
        assert dataset_utils.check_availability_via_download_size(f, 1000)
        assert dataset_utils.check_availability_via_download_size(f, 1015)
        assert not dataset_utils.check_availability_via_download_size(f, 1500)
        assert not dataset_utils.check_availability_via_download_size(
            tmp_path / "nope", 1000)


class TestUnpack:

    def test_unzip(self, tmp_path):
        src = tmp_path / "a.zip"
        with zipfile.ZipFile(src, "w") as zf:
            zf.writestr("inner/data.txt", "hello")
        out = dataset_utils.unzip(src, tmp_path / "out")
        assert (out / "inner" / "data.txt").read_text() == "hello"

    def test_untar(self, tmp_path):
        payload = tmp_path / "data.txt"
        payload.write_text("hello")
        src = tmp_path / "a.tar.gz"
        with tarfile.open(src, "w:gz") as tf:
            tf.add(payload, arcname="data.txt")
        out = dataset_utils.untar(src, tmp_path / "out")
        assert (out / "data.txt").read_text() == "hello"


class TestBaseDataset:

    def test_load_n_records_cap(self):
        class Tiny(BaseDataset):
            @classmethod
            def is_available(cls):
                return True

            @classmethod
            def download(cls):
                raise AssertionError("should not download")

            @classmethod
            def extract_data(cls):
                return pd.DataFrame({"a": range(100)})

        df = Tiny.load_data()
        assert len(df) == 100
        Tiny.set_load_n_records(7)
        try:
            assert len(Tiny.load_data()) == 7
        finally:
            Tiny.set_load_n_records(None)

    def test_download_invoked_when_unavailable(self):
        calls = []

        class Tiny(BaseDataset):
            @classmethod
            def is_available(cls):
                return bool(calls)

            @classmethod
            def download(cls):
                calls.append(1)

            @classmethod
            def extract_data(cls):
                return pd.DataFrame({"a": [1]})

        Tiny.load_data()
        assert calls == [1]


# ------------------------------------------------------------------------- #
# golden vocab sizes (reference tests/datalaoders_tests/
# bert4rec_dataloaders_tests.py:179,222-250) — run only with data on disk.
# NOTE: these remain NETWORK-GATED (auto-skip offline). The offline parser
# fixtures (tests/fixtures/ + test_parser_fixtures.py) exercise format
# logic on format-exact samples but are NOT a substitute for these
# golden-stat checks against the real corpora — do not mistake one for
# the other when reading a green offline suite.
# ------------------------------------------------------------------------- #

GOLDEN_VOCAB_SIZES = {
    "ml_1m": 3706,
    "ml_20m": 26729,
    "beauty": 54542,
    "steam": 13044,
    "reddit": 335420,
}
N_SPECIAL_TOKENS = 3


@pytest.mark.parametrize("name,expected", sorted(GOLDEN_VOCAB_SIZES.items()))
def test_golden_vocab_size(name, expected):
    from bert4rec_tpu.dataloaders import get_dataloader_factory
    factory = get_dataloader_factory("bert4rec")
    dataloader = getattr(factory, f"create_{name}_dataloader")()
    if not dataloader.data_source.is_available():
        pytest.skip(f"{name} raw data not on disk (no network in CI)")
    dataloader.generate_vocab()
    assert dataloader.tokenizer.get_vocab_size() == expected + N_SPECIAL_TOKENS
