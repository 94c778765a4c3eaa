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


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dataset", default="ml_1m", choices=["ml_1m"])
    p.add_argument("--home", required=True,
                   help="BERT4REC_TPU_HOME to populate (data goes to "
                        "<home>/data/<dataset>)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    make_ml1m(pathlib.Path(args.home), args.seed)
    return 0


if __name__ == "__main__":
    sys.exit(main())
