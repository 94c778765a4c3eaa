"""Diagnose the SASRec@ml20m oracle plateau (VERDICT r4 weak #2 / next #3).

Measured r4: the causal family reaches HR@10 ratio 0.924 / NDCG@10 0.845
at the ml20m preset's 60 epochs and scores LOWER at 120 (0.921/0.821) —
training longer hurting is a red flag that r4 left as an accepted
"plateau". The mechanism hypothesis this tool tests:

  The masked-LM family re-masks every epoch (dataloader_utils' per-epoch
  re-mask), so each epoch shows the model a FRESH stochastic view of each
  sequence — built-in data augmentation. The next-item task is
  DETERMINISTIC: identical (input, target) pairs every epoch, so extra
  epochs only re-fit the same 16k rows — classic memorization, which the
  widened 26.7k catalog (8x the transitions to estimate from the same
  row budget) makes visible at ml20m while ml1m's denser per-transition
  coverage hides it.

Falsifiable predictions measured here (one fresh model per cell, all
against the ONE fixed Bayes oracle):

  1. train-holdout metrics rise with epochs while test ratios fall
     (memorization signal);
  2. doubling train_rows at the same step budget lifts test ratios
     (data-limited, not capacity/schedule-limited);
  3. stronger dropout at 120 epochs recovers (or not) the 60-epoch point
     (regularization substitutes for the re-mask augmentation MLM gets).

Usage (on the TPU; ~15 min):

    python tools/sasrec_plateau.py
    python tools/sasrec_plateau.py --cells base60,rows2x_60

Artifact: quality_runs/sasrec_ml20m_plateau/report.json
"""

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# cell name -> preset overrides (everything else = the ml20m oracle preset)
CELLS = {
    # reproduce the r4 plateau endpoints
    "base60": dict(epochs=60),
    "base120": dict(epochs=120),
    # prediction 2: same 60-epoch budget, twice the rows
    "rows2x_60": dict(epochs=60, train_rows=32768),
    # prediction 3: regularization at the long budget
    "drop30_120": dict(epochs=120, dropout=0.3),
}


def parse(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--cells", default=",".join(CELLS),
                   help="comma-separated cell names to run")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", default="quality_runs/sasrec_ml20m_plateau")
    p.add_argument("--preset", default="ml20m",
                   help="oracle preset to diagnose (tiny = offline "
                        "plumbing check)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse(argv)
    import numpy as np
    import jax
    from bert4rec_tpu.dataloaders.processed_dataset import (
        MaskingConfig, ProcessedDataset,
    )
    from bert4rec_tpu.evaluation.markov_oracle import (
        MarkovCatalog, MarkovOracleScorer, evaluate_scorer,
    )
    from bert4rec_tpu.evaluation.quality_harness import _ORACLE_PRESETS
    from bert4rec_tpu.models import BERT4RecConfig, SASRecModel, model_utils
    from bert4rec_tpu.trainers import BERT4RecTrainer, optimizers

    ps = dict(_ORACLE_PRESETS[args.preset])
    on_tpu = jax.devices()[0].platform == "tpu"
    t_start = time.time()

    # the fixed world every cell shares: catalog, eval rows, oracle —
    # identical to run_oracle's sasrec path (context at the predicted
    # position => offset 1)
    cat = MarkovCatalog(n_items=ps["n_items"], branching=ps["branching"],
                        alpha=ps["alpha"], zipf_s=ps["zipf_s"],
                        seed=args.seed)
    max_rows = max(c.get("train_rows", ps["train_rows"])
                   for c in CELLS.values())
    all_train = cat.sample_sequences(max_rows, ps["min_len"], ps["seq"],
                                     seed=args.seed + 1)
    test_seqs = cat.sample_sequences(ps["test_rows"], ps["min_len"],
                                     ps["seq"], seed=args.seed + 2)
    cfg = MaskingConfig(max_seq_len=ps["seq"],
                        max_predictions_per_seq=ps["max_pred"],
                        mask_token_id=1, pad_token_id=0, unk_token_id=2,
                        masked_lm_rate=ps["mask_rate"])
    test = ProcessedDataset(test_seqs, cfg, lambda: cat.vocab_size,
                            finetuning=np.ones(len(test_seqs), bool),
                            task="next_item")
    # train-HOLDOUT view: the first 512 training rows under the EVAL
    # protocol (LOO last item). Rising here while test falls =
    # memorization of the training rows.
    train_view = ProcessedDataset(
        all_train[:512], cfg, lambda: cat.vocab_size,
        finetuning=np.ones(512, bool), task="next_item")

    source = [int(t) for s in all_train[:ps["train_rows"]] for t in s]
    counts = np.bincount(source, minlength=cat.vocab_size)
    ekw = dict(source=source, sample_size=ps["sample_size"], seed=0,
               batch_size=ps["batch_size"])
    oracle = evaluate_scorer(MarkovOracleScorer(cat, context_offset=1),
                             None, test, **ekw)
    oracle_train = evaluate_scorer(
        MarkovOracleScorer(cat, context_offset=1), None, train_view, **ekw)
    print(f"[plateau] oracle (test): HR@10 {oracle['HR@10']:.4f} "
          f"NDCG@10 {oracle['NDCG@10']:.4f}", flush=True)

    def run_cell(name, overrides):
        rows = overrides.get("train_rows", ps["train_rows"])
        dropout = overrides.get("dropout")
        epochs = overrides.get("epochs", ps["epochs"])
        lr = overrides.get("lr", ps["lr"])
        train = ProcessedDataset(all_train[:rows], cfg,
                                 lambda: cat.vocab_size, task="next_item")
        mkw = dict(ps["model"])
        if dropout is not None:
            mkw.update(attention_dropout=dropout, output_dropout=dropout)
        model = SASRecModel(config=BERT4RecConfig(
            vocab_size=cat.vocab_size, max_sequence_length=ps["seq"],
            max_predictions_per_seq=ps["max_pred"],
            use_fused_layer=on_tpu, use_fused_loss=on_tpu, **mkw))
        params = model_utils.init_output_bias_from_popularity(
            model.init(jax.random.key(args.seed)), counts)
        trainer = BERT4RecTrainer(model, steps_per_call=4 if on_tpu else 1)
        trainer.initialize_model(
            optimizer=optimizers.create_adam_w_optimizer(
                init_lr=lr, num_train_steps=400_000, num_warmup_steps=100),
            params=params)
        history = trainer.train(train, epochs=epochs,
                                batch_size=ps["batch_size"], verbose=False,
                                seed=args.seed)
        res = evaluate_scorer(model, trainer.params, test, **ekw)
        res_train = evaluate_scorer(model, trainer.params, train_view,
                                    **ekw)
        cell = {
            "overrides": {k: v for k, v in overrides.items()},
            "final_train_loss": round(
                float(history.history["loss"][-1]), 4),
            "test": {k: round(float(v), 4) for k, v in res.items()},
            "train_holdout": {k: round(float(v), 4)
                              for k, v in res_train.items()},
            "test_ratio": {
                "HR@10": round(float(res["HR@10"])
                               / float(oracle["HR@10"]), 4),
                "NDCG@10": round(float(res["NDCG@10"])
                                 / float(oracle["NDCG@10"]), 4)},
            "train_holdout_ratio": {
                "HR@10": round(float(res_train["HR@10"])
                               / float(oracle_train["HR@10"]), 4),
                "NDCG@10": round(float(res_train["NDCG@10"])
                                 / float(oracle_train["NDCG@10"]), 4)},
        }
        print(f"[plateau] {name}: test ratio {cell['test_ratio']} "
              f"train-holdout ratio {cell['train_holdout_ratio']} "
              f"loss {cell['final_train_loss']}", flush=True)
        return cell

    cells = {}
    for name in args.cells.split(","):
        cells[name] = run_cell(name, CELLS[name])

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    payload = {
        "purpose": __doc__.split("\n")[0],
        "platform": __import__("jax").devices()[0].platform,
        "preset": f"{args.preset} (sasrec family, context_offset=1)",
        "oracle_test": {k: round(float(v), 4) for k, v in oracle.items()},
        "oracle_train_holdout": {k: round(float(v), 4)
                                 for k, v in oracle_train.items()},
        "wall_seconds": round(time.time() - t_start, 1),
        "cells": cells,
    }
    (out / "report.json").write_text(json.dumps(payload, indent=2) + "\n")
    print(json.dumps({"out": str(out / "report.json"),
                      "cells": {n: c["test_ratio"]
                                for n, c in cells.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
