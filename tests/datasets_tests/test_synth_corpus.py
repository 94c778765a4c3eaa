"""tools/synth_corpus.py: the generated corpus must be indistinguishable
from the real dataset to the pipeline (availability byte-size check,
exact file formats, learnable next-item structure)."""

import importlib.util
import pathlib

import pytest

from bert4rec_tpu.datasets import ML1M, dataset_utils

REPO = pathlib.Path(__file__).resolve().parent.parent.parent
# load by path (no sys.path side effects on the rest of the session)
_spec = importlib.util.spec_from_file_location(
    "synth_corpus", REPO / "tools" / "synth_corpus.py")
synth_corpus = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(synth_corpus)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    home = tmp_path_factory.mktemp("synth_home")
    return synth_corpus.make_ml1m(home, seed=0)


def test_passes_availability_check(corpus):
    assert dataset_utils.check_availability_via_download_size(
        corpus, synth_corpus.ML1M_TARGET_BYTES)


def test_parses_through_the_real_extractor(corpus, monkeypatch):
    monkeypatch.setattr(ML1M, "dest", corpus)
    monkeypatch.setattr(ML1M, "load_n_records", 50_000)
    try:
        df = ML1M.extract_data()
    finally:
        monkeypatch.setattr(ML1M, "load_n_records", None)
    assert list(df.columns) == ["uid", "sid", "rating", "timestamp",
                                "movie_name", "categories"]
    assert len(df) > 10_000
    assert df["movie_name"].str.contains("Synthetic").all()
    # per-user timestamps strictly increase (sortable like the real data)
    g = df[df["uid"] == 1].sort_values("timestamp")
    assert g["timestamp"].is_monotonic_increasing
    assert len(g) >= 20


def test_beauty_pair_corpus(tmp_path, monkeypatch):
    from bert4rec_tpu.datasets import Beauty
    path = synth_corpus.make_beauty(tmp_path, seed=0)
    assert dataset_utils.check_availability_via_download_size(
        path, synth_corpus.BEAUTY_TARGET_BYTES)
    monkeypatch.setattr(Beauty, "dest", path)
    monkeypatch.setattr(Beauty, "load_n_records", 20_000)
    df = Beauty.extract_data()
    assert list(df.columns) == ["user_id", "item_id"]
    assert df["item_id"].str.startswith("B").all()
    assert df["user_id"].is_monotonic_increasing


def test_reddit_zst_corpus(tmp_path, monkeypatch):
    pytest.importorskip("zstandard")
    from bert4rec_tpu.datasets import Reddit
    monkeypatch.setattr(synth_corpus, "REDDIT_N_AUTHORS", 200)
    monkeypatch.setattr(synth_corpus, "REDDIT_N_ITEMS", 128)
    path = synth_corpus.make_reddit(tmp_path, seed=0)
    monkeypatch.setattr(Reddit, "dest", path)
    df = Reddit.extract_data()
    assert {"author", "parent_id", "created_utc"} <= set(df.columns)
    filtered = Reddit.filter_data(df)
    # the generator promises every author/item clears the >=3 filters
    assert len(filtered) == len(df)
    assert filtered["parent_id"].nunique() == 128


def test_interactions_follow_the_global_permutation(corpus):
    import numpy as np
    lines = (corpus / "ratings.dat").read_text().splitlines()
    rows = [line.split("::") for line in lines[:2000]]
    uid0 = rows[0][0]
    sids = [int(r[1]) for r in rows if r[0] == uid0]
    # successor of a movie must be the same everywhere: check user 2
    # walks the same rule wherever its window overlaps user 1's
    succ = {a: b for a, b in zip(sids, sids[1:])}
    sids2 = [int(r[1]) for r in rows if r[0] == "2"]
    overlaps = [(a, b) for a, b in zip(sids2, sids2[1:]) if a in succ]
    assert overlaps, "users should overlap on the shared permutation"
    assert all(succ[a] == b for a, b in overlaps)
    assert np.all(np.asarray(sids) >= 1)


def test_join_movies_matches_pd_merge():
    import pandas as pd
    ratings = pd.DataFrame({
        "uid": [1, 1, 2, 3], "sid": [10, 20, 10, 99],
        "rating": [5, 3, 4, 1], "timestamp": [100, 200, 150, 50]})
    movies = pd.DataFrame({
        "sid": [10, 20], "movie_name": ["A", "B"],
        "categories": ["x", "y"]})
    ours = dataset_utils.join_movies(ratings, movies)
    ref = pd.merge(ratings, movies)
    pd.testing.assert_frame_equal(
        ours.sort_values(["uid", "sid"]).reset_index(drop=True),
        ref.sort_values(["uid", "sid"]).reset_index(drop=True),
        check_dtype=False)
    assert len(ours) == 3  # sid 99 has no movie row (inner join)


def test_join_movies_keeps_nan_metadata_and_dup_sids():
    import numpy as np
    import pandas as pd
    ratings = pd.DataFrame({
        "uid": [1, 2], "sid": [10, 20],
        "rating": [5, 3], "timestamp": [100, 200]})
    movies = pd.DataFrame({
        "sid": [10, 20], "movie_name": ["A", np.nan],
        "categories": ["x", "y"]})
    ours = dataset_utils.join_movies(ratings, movies)
    assert len(ours) == 2  # NaN title is metadata, not a join miss
    assert ours["movie_name"].isna().sum() == 1
    # duplicate sids fall back to merge's row-per-match
    dup = pd.DataFrame({"sid": [10, 10], "movie_name": ["A", "B"],
                        "categories": ["x", "y"]})
    out = dataset_utils.join_movies(ratings, dup)
    ref = pd.merge(ratings, dup)
    pd.testing.assert_frame_equal(out, ref)
