"""SimpleTokenizer behavior (contracts from reference
tests/tokenizers_tests/simple_tokenizer_tests.py)."""

import numpy as np
import pandas as pd
import pytest

from bert4rec_tpu import tokenizers


@pytest.fixture
def tok():
    return tokenizers.get("simple")


def test_factory():
    t = tokenizers.get("simple")
    assert isinstance(t, tokenizers.SimpleTokenizer)
    assert tokenizers.get(t) is t
    with pytest.raises(ValueError):
        tokenizers.get("nope")


def test_sequential_ids_from_zero(tok):
    assert tok.tokenize("a") == 0
    assert tok.tokenize("b") == 1
    assert tok.tokenize("a") == 0  # duplicates keep their id
    assert tok.get_vocab_size() == 2


def test_tokenize_list_and_nested(tok):
    out = tok.tokenize(["x", "y", "x"])
    assert out == [0, 1, 0]
    nested = tok.tokenize([["x", "z"], ["y"]])
    assert nested == [[0, 2], [1]]


def test_tokenize_bytes(tok):
    assert tok.tokenize(b"abc") == tok.tokenize("abc")


def test_tokenize_numpy_array(tok):
    arr = np.array(["a", "b", "a"])
    out = tok.tokenize(arr)
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, [0, 1, 0])


def test_tokenize_pandas_series(tok):
    col = pd.Series(["p", "q", "p"])
    out = tok.tokenize(col)
    assert out.tolist() == [0, 1, 0]


def test_detokenize_roundtrip(tok):
    items = ["alpha", "beta", "gamma"]
    tokens = tok.tokenize(items)
    assert tok.detokenize(tokens) == items
    assert tok.detokenize(np.array(tokens)) == items


def test_detokenize_drop_tokens(tok):
    tok.tokenize(["[PAD]", "a", "b"])
    out = tok.detokenize([0, 1, 2], drop_tokens=["[PAD]"])
    assert out == ["a", "b"]


def test_detokenize_unknown_returns_none(tok):
    tok.tokenize("a")
    assert tok.detokenize(99) is None


def test_extensibility_flag():
    t = tokenizers.get("simple", extensible=False)
    with pytest.raises(RuntimeError):
        t.tokenize("unknown")
    t.enable_extensibility()
    assert t.tokenize("unknown") == 0


def test_vocab_file_roundtrip(tok, tmp_path):
    tok.tokenize(["one", "two", "three"])
    path = tmp_path / "vocab.txt"
    assert tok.export_vocab_to_file(path)

    t2 = tokenizers.get("simple")
    t2.import_vocab_from_file(path)
    assert t2.get_vocab_size() == 3
    assert t2.tokenize("two") == tok.tokenize("two")
    assert t2.detokenize(0) == "one"


def test_vocab_file_via_constructor(tok, tmp_path):
    tok.tokenize(["one", "two"])
    path = tmp_path / "vocab.txt"
    tok.export_vocab_to_file(path)
    t2 = tokenizers.SimpleTokenizer(vocab_file_path=path)
    assert t2.get_vocab_size() == 2


def test_export_empty_vocab_raises(tok, tmp_path):
    with pytest.raises(ValueError):
        tok.export_vocab_to_file(tmp_path / "v.txt")


def test_import_missing_file_raises(tok, tmp_path):
    with pytest.raises(RuntimeError):
        tok.import_vocab_from_file(tmp_path / "missing.txt")


def test_import_bad_format_raises(tok, tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("no delimiter here\n")
    with pytest.raises(ValueError):
        tok.import_vocab_from_file(bad)


def test_clear_vocab(tok):
    tok.tokenize(["a", "b"])
    tok.clear_vocab()
    assert tok.get_vocab_size() == 0
    assert tok.tokenize("c") == 0


def test_num_vocab_file_roundtrip(tmp_path):
    from bert4rec_tpu.tokenizers import tokenizer_utils
    path = tmp_path / "nums.txt"
    tokenizer_utils.export_num_vocab_to_file(path, [5, 7, 9])
    assert tokenizer_utils.import_num_vocab_from_file(path) == [5, 7, 9]


def test_tokenize_array_rejects_nan():
    import numpy as np
    import pytest
    from bert4rec_tpu.tokenizers import SimpleTokenizer
    tok = SimpleTokenizer()
    with pytest.raises(ValueError, match="null/NaN"):
        tok.tokenize(np.array(["x", "y", np.nan, "x"], dtype=object))
