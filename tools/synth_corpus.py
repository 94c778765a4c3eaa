"""Generate a synthetic corpus in a dataset's exact on-disk format.

The real-data quality path (tools/quality_run.py without --smoke) can
only execute when the raw dataset files are on disk and pass the
reference's byte-size availability check — and this environment has no
network. This tool writes a synthetic corpus that is indistinguishable
to the pipeline: exact file formats, the dataset's expected total byte
size (the ±2% availability check passes), the golden catalog size
(ML-1M: 3706 distinct movies), and realistic per-user history lengths —
so the ENTIRE real path (availability → pandas extraction → LOO split →
vocab generation → duplication → training → evaluation → artifact) runs
end to end, just on synthetic interactions:

    python tools/synth_corpus.py --home /tmp/synth_home
    BERT4REC_TPU_HOME=/tmp/synth_home \
        python tools/quality_run.py --dataset ml_1m --epochs 8

Interactions follow a learnable rule (each user's history walks a fixed
global permutation of the catalog from a random start), so the
leave-one-out ground truth is predictable and the resulting HR@10 is a
meaningful learning signal, not chance.

Reference formats: ml_1m.py:38-57 (``uid::sid::rating::timestamp`` +
``sid::title::genres``).
"""

import argparse
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ML1M_N_MOVIES = 3706            # golden distinct-movie count
ML1M_TARGET_BYTES = 24905384    # datasets/ml_1m.py download_size
BEAUTY_TARGET_BYTES = 3912093   # datasets/beauty.py download_size
BEAUTY_N_ITEMS = 4096           # synthetic choice: the real catalog is
                                # 54.5k items at ~6 observations each —
                                # far too sparse for a short synthetic
                                # learning run; a denser catalog keeps the
                                # artifact's HR meaningful (the pipeline
                                # derives the vocab from the data either
                                # way)
STEAM_TARGET_BYTES = 38226650   # datasets/steam.py download_size
STEAM_N_ITEMS = 13044           # golden distinct-item count
ML20M_N_MOVIES = 26729          # golden distinct-movie count
ML20M_TARGET_BYTES = 875588784  # datasets/ml_20m.py download_size (whole
                                # dir; the real download's bulk is genome
                                # files the extractor never reads)


def make_ml1m(home: pathlib.Path, seed: int = 0):
    rng = np.random.default_rng(seed)
    dest = home / "data" / "ml-1m"
    dest.mkdir(parents=True, exist_ok=True)

    genres = ["Action", "Comedy", "Drama", "Thriller", "Romance",
              "Animation", "Sci-Fi", "Documentary"]
    movie_lines = []
    for sid in range(1, ML1M_N_MOVIES + 1):
        name = f"Synthetic Feature No. {sid:04d} ({1920 + sid % 100})"
        gs = "|".join(sorted({genres[(sid + k) % len(genres)]
                              for k in range(1 + sid % 3)}))
        movie_lines.append(f"{sid}::{name}::{gs}")
    movies_blob = ("\n".join(movie_lines) + "\n").encode()

    # users walk a fixed permutation of the catalog from a random start:
    # item -> next item is a global deterministic rule the model can learn
    perm = rng.permutation(ML1M_N_MOVIES) + 1

    target_ratings_bytes = ML1M_TARGET_BYTES - len(movies_blob)
    parts, nbytes = [], 0
    uid = 0
    while nbytes < target_ratings_bytes:
        uid += 1
        n = int(np.clip(rng.lognormal(4.6, 0.8), 20, 600))
        start = int(rng.integers(0, ML1M_N_MOVIES))
        sids = perm[(start + np.arange(n)) % ML1M_N_MOVIES]
        t0 = int(rng.integers(9.6e8, 1.0e9))
        lines = [f"{uid}::{s}::{1 + (s + i) % 5}::{t0 + i * 60}"
                 for i, s in enumerate(sids)]
        blob = ("\n".join(lines) + "\n").encode()
        parts.append(blob)
        nbytes += len(blob)
    # trim the final user's tail lines to land inside the ±2% window
    overshoot = nbytes - target_ratings_bytes
    if overshoot > 0:
        last = parts[-1].decode().splitlines(keepends=True)
        while last and overshoot > 0:
            overshoot -= len(last.pop())
        parts[-1] = "".join(last).encode()

    (dest / "movies.dat").write_bytes(movies_blob)
    with open(dest / "ratings.dat", "wb") as f:
        for blob in parts:
            f.write(blob)

    total = sum(p.stat().st_size for p in dest.iterdir())
    assert abs(total - ML1M_TARGET_BYTES) <= 0.02 * ML1M_TARGET_BYTES, total
    print(f"ml-1m synthetic corpus: {dest} ({uid} users, "
          f"{total} bytes vs expected {ML1M_TARGET_BYTES})")
    return dest


def _pair_file(dest: pathlib.Path, target_bytes: int, n_items: int,
               rng, item_fmt, seq_lo=15, seq_hi=60):
    """Write a FeiSun-style ``user item`` pair file of exactly-checked
    size: users walk a global permutation from random starts (the same
    learnable next-item rule as ML-1M). Item ids are strings, as in the
    real files (reference beauty.py:43-48)."""
    dest.parent.mkdir(parents=True, exist_ok=True)
    perm = rng.permutation(n_items)
    parts, nbytes, uid = [], 0, 0
    while nbytes < target_bytes:
        uid += 1
        n = int(rng.integers(seq_lo, seq_hi + 1))
        start = int(rng.integers(0, n_items))
        items = perm[(start + np.arange(n)) % n_items]
        blob = ("".join(f"{uid} {item_fmt(int(s))}\n" for s in items)
                ).encode()
        parts.append(blob)
        nbytes += len(blob)
    overshoot = nbytes - target_bytes
    if overshoot > 0:
        last = parts[-1].decode().splitlines(keepends=True)
        while last and overshoot > 0:
            overshoot -= len(last.pop())
        parts[-1] = "".join(last).encode()
    with open(dest, "wb") as f:
        for blob in parts:
            f.write(blob)
    assert abs(dest.stat().st_size - target_bytes) <= 0.02 * target_bytes
    print(f"pair corpus: {dest} ({uid} users, {dest.stat().st_size} bytes "
          f"vs expected {target_bytes})")
    return dest


def make_beauty(home: pathlib.Path, seed: int = 0):
    rng = np.random.default_rng(seed + 1)
    return _pair_file(
        home / "data" / "beauty" / "ratings_beauty_tokenized.txt",
        BEAUTY_TARGET_BYTES, BEAUTY_N_ITEMS, rng,
        lambda s: f"B{s:09d}")


def make_steam(home: pathlib.Path, seed: int = 0):
    rng = np.random.default_rng(seed + 2)
    return _pair_file(
        home / "data" / "steam" / "ratings_steam_tokenized.txt",
        STEAM_TARGET_BYTES, STEAM_N_ITEMS, rng,
        lambda s: str(10000 + s))


def make_ml20m(home: pathlib.Path, seed: int = 0, small: bool = False):
    """ratings.csv + movies.csv (headers, comma-separated) + one filler
    genome file so the whole-directory byte-size check passes — the real
    download's bulk is genome files the extractor never reads.

    ``small`` writes a few-MB corpus (same formats, same learnable rule,
    NO genome filler) for consumers that run under a record cap — the
    availability gate degrades to existence-only when
    ``load_n_records``/``BERT4REC_TPU_LOAD_N_RECORDS`` is active
    (datasets/base_dataset.py ``_size_gate``), which is how
    tests/test_examples.py executes the ML-20M example without paying
    the ~900 MB full-size corpus tax."""
    import pandas as pd

    rng = np.random.default_rng(seed + 3)
    dest = home / "data" / "ml-20m"
    dest.mkdir(parents=True, exist_ok=True)

    # the small corpus keeps a catalog slice (the record-capped reader
    # only joins the first load_n_records movies anyway)
    n_movies = 2048 if small else ML20M_N_MOVIES
    movies = pd.DataFrame({
        "movieId": np.arange(1, n_movies + 1),
        "title": [f"Synthetic Feature No. {i:05d} ({1920 + i % 100})"
                  for i in range(1, n_movies + 1)],
        "genres": ["Drama|Comedy" if i % 2 else "Action"
                   for i in range(1, n_movies + 1)],
    })
    movies.to_csv(dest / "movies.csv", index=False)

    perm = rng.permutation(n_movies) + 1
    n_users = 400 if small else 130_000
    lengths = np.clip(rng.lognormal(4.8, 0.7, n_users), 20, 800).astype(int)
    uid = np.repeat(np.arange(1, n_users + 1), lengths)
    starts = rng.integers(0, n_movies, n_users)
    offsets = np.concatenate([np.arange(n) for n in lengths])
    sid = perm[(np.repeat(starts, lengths) + offsets) % n_movies]
    t0 = np.repeat(rng.integers(9.6e8, 1.0e9, n_users), lengths)
    ratings = pd.DataFrame({
        "userId": uid, "movieId": sid,
        "rating": ((sid + offsets) % 9 + 2) / 2.0,
        "timestamp": t0 + offsets * 60,
    })
    ratings.to_csv(dest / "ratings.csv", index=False)

    if not small:
        used = sum(p.stat().st_size for p in dest.iterdir())
        filler = ML20M_TARGET_BYTES - used
        assert filler > 0, used
        with open(dest / "genome-scores.csv", "wb") as f:
            f.write(b"movieId,tagId,relevance\n")
            chunk = b"1,1,0.5000\n" * 65536
            remaining = filler - 24
            while remaining > 0:
                f.write(chunk[:remaining])
                remaining -= len(chunk)
        total = sum(p.stat().st_size for p in dest.iterdir())
        assert abs(total - ML20M_TARGET_BYTES) <= 0.02 * ML20M_TARGET_BYTES
    total = sum(p.stat().st_size for p in dest.iterdir())
    print(f"ml-20m synthetic corpus: {dest} ({n_users} users, "
          f"{len(ratings)} ratings, {total} bytes"
          + ("" if small else f" vs expected {ML20M_TARGET_BYTES}") + ")")
    return dest


REDDIT_N_ITEMS = 4096           # synthetic choice (density; the real
                                # dump's 335k-item width is covered by the
                                # --smoke-scale reddit on-chip artifact)
REDDIT_N_AUTHORS = 20_000


def make_reddit(home: pathlib.Path, seed: int = 0, small: bool = False):
    """zstd-compressed pushshift-style JSON-lines comment dump
    (availability gate is file existence; reference reddit.py:49-80).
    Authors comment on threads following the global permutation rule;
    every author/item clears the >=3-occurrence filters.

    ``small`` writes a few-thousand-row dump with a dense catalog sized
    so that even an 8k-record cap leaves every item above the
    >=3-occurrence filter (tests/test_examples.py runs the Reddit
    example with ``BERT4REC_TPU_LOAD_N_RECORDS=8000``)."""
    import json as _json
    import zstandard as zstd

    rng = np.random.default_rng(seed + 4)
    dest = home / "data" / "reddit" / "comments" / "RC_2011-01.zst"
    dest.parent.mkdir(parents=True, exist_ok=True)

    n_items = 256 if small else REDDIT_N_ITEMS
    n_authors = 800 if small else REDDIT_N_AUTHORS
    perm = rng.permutation(n_items)
    rows = []
    for a in range(n_authors):
        n = int(rng.integers(40, 81))
        start = int(rng.integers(0, n_items))
        items = perm[(start + np.arange(n)) % n_items]
        t0 = int(rng.integers(1.29e9, 1.30e9))
        rows.extend(
            {"author": f"user_{a:06d}", "parent_id": f"t3_{int(s):06x}",
             "created_utc": t0 + i * 300, "subreddit": "synthetic"}
            for i, s in enumerate(items))
    rng.shuffle(rows)  # dumps are time-interleaved, not author-grouped
    blob = "\n".join(_json.dumps(r) for r in rows).encode() + b"\n"
    with open(dest, "wb") as f:
        f.write(zstd.ZstdCompressor(level=3).compress(blob))
    print(f"reddit synthetic corpus: {dest} ({n_authors} authors, "
          f"{len(rows)} comments, {dest.stat().st_size} bytes compressed)")
    return dest


_MAKERS = {"ml_1m": make_ml1m, "ml_20m": make_ml20m,
           "beauty": make_beauty, "steam": make_steam,
           "reddit": make_reddit}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dataset", default="ml_1m", choices=sorted(_MAKERS))
    p.add_argument("--home", required=True,
                   help="BERT4REC_TPU_HOME to populate (data goes to "
                        "<home>/data/<dataset>)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--small", action="store_true",
                   help="few-MB corpus (ml_20m/reddit only) for consumers "
                        "running under a record cap, where the "
                        "availability gate is existence-only")
    args = p.parse_args(argv)
    kwargs = {}
    if args.small:
        if args.dataset not in ("ml_20m", "reddit"):
            p.error("--small is supported for ml_20m and reddit (the "
                    "other corpora are already small at full size)")
        kwargs["small"] = True
    _MAKERS[args.dataset](pathlib.Path(args.home), args.seed, **kwargs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
