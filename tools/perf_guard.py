"""Throughput regression guard (VERDICT r1 weak #7): one command that fails
loudly if the fused-kernel wins regress.

Runs on a real TPU. Measures the ml-1m_128 train step for three paths in
ONE process, interleaved round-robin with min-of-rounds (cross-process
run-to-run variance on this platform is ~±30%; interleaving in one process
removes it):

    xla         — pure XLA step (no Pallas kernels)
    xla_multi4  — XLA step under 4-step lax.scan dispatch (the speedup
                  floor's baseline: same dispatch mode as fused_multi4)
    fused_layer — whole-layer Pallas fusion
    fused_full  — fused layer + fused tied-softmax loss
    fused_multi4 — fused_full under 4-step dispatch (the bench config)

Asserts against the stored budgets below and optionally re-runs the kernel
numerics checks (tools/verify_kernels_on_tpu.py) first:

    python tools/perf_guard.py              # perf only
    python tools/perf_guard.py --numerics   # kernel numerics + perf

Process structure: the top-level command is a jax-free ORCHESTRATOR; each
measurement pass runs in its own ``--worker`` subprocess so exactly one
process claims the TPU at a time (serial-access discipline — a retry
launched while the parent still held the chip would contend/wedge). On a
budget miss the orchestrator cools down 90 s and runs ONE more worker,
taking the per-variant min of the two independent process draws.

Budgets (v5e, B=256, S=200; round-1 measured values in parens):
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# measured r2 (v5e): xla 18.3, fused_layer 9.3, fused_full 8.9,
# fused_multi4 7.1 ms/step; ml20m_tiled (ml-20m_256 + vocab-tiled fused
# loss) 19.9 ms.
#
# The tunneled chip shows SUSTAINED per-process drift that hits the
# Pallas paths hardest while the XLA path stays flat — byte-identical
# kernels (proven by diffing the lowered HLO across commits) measured
# fused_multi4 8.4/9.4/9.9/11.6 and sasrec_multi4 8.5/9.4/13.2 ms across
# processes on the same day, with xla pinned at 18.3-19.4 throughout.
# r3 handled this with loose ceilings (worst-burst x 1.15 ≈ 1.8x the
# healthy measurement, loose enough to hide a 40% kernel regression —
# VERDICT r3 weak #2). r4 instead RETRIES: a budget failure re-runs the
# whole guard once in a FRESH process after a cool-down and takes the
# per-variant min of the two independent process draws — a drift burst
# is per-process and won't strike twice, while a genuine regression
# fails both. That makes healthy-measurement x ~1.25 ceilings safe.
BUDGET_MS = {
    # Policy (BASELINE.md): worst-observed HEALTHY-process measurement
    # x 1.15. r5 pulled the slack back to that line now that the
    # fresh-process retry absorbs drift bursts (VERDICT r4 #8).
    # Worst healthy across r3/r4/r11: fused_full 10.33, fused_layer
    # 10.3, fused_multi4 9.1; drift bursts have reached 14.9/12.6/11.6
    # in a single process (2026-08) — the retry pass absorbs those
    "fused_full": 12.0,
    "fused_layer": 12.0,
    "fused_multi4": 10.5,
    "ml20m_tiled": 23.0,
    # SASRec: same dims + causal_attention (in-VMEM triangle in the fused
    # kernels) — tracks the bidirectional fused_multi4 modulo drift
    # (healthy 8.5-10.8)
    "sasrec_multi4": 12.5,
    # Reddit scale (335k vocab, reddit_128 dims): vocab-tiled flash-softmax
    # loss. r2 shipped 64.3 ms (fp32 streaming, R=512, argmax metric, two
    # backward sweeps); r3 measured 41.25 ms interleaved best (no argmax
    # pass, bias-folded vocab mask, merged single-sweep backward with
    # VMEM-resident dh, bf16 table streaming); r4 40.0.
    "reddit_tiled": 47.0,
    # the reference's DEFAULT encoder scale (hidden 768, 12 layers, S=512 —
    # reference bert4rec_encoder.py:62-79), B=32, flash-attention path
    # (head-grouped cells, ops/flash_attention.py _heads_per_cell),
    # NO remat: activations fit at B=32 and the remat re-forward costs
    # 25% (r4 tools/bert_base_roofline.py: remat 157.6 ms / 30.0% MFU,
    # no-remat 117.9 ms / 40.1% MFU; K=4 dispatch no better at this
    # scale). r3 guarded the remat config at 180.
    "bert_base_512": 135.0,
    # temporal family (recency embeddings + TiSASRec-style relative-time
    # bias): r3 rebuilt the bias in-kernel from bucket ids (36.2 ms,
    # VPU-bound select chains); r4 streams the precomputed dense bias
    # through the kernel with one-hot-matmul lookup/scatter in XLA —
    # measured 14.55 ms interleaved against fused_multi4 9.08 (r4);
    # worst healthy 15.08 (PERF_r11)
    "temporal_multi4": 17.5,
}
# the speedup floor compares xla_multi4 vs fused_multi4 — SAME dispatch
# mode, so the ratio isolates the kernels. Healthy processes measure
# 1.82-2.22x (r3) / 2.1x (r4); a drift burst measured 1.64x in a process
# whose fused_multi4 sat at 11.6 — the retry pass absorbs that, so the
# floor sits just under the healthy band instead of 61% of it
# (VERDICT r3 weak #2).
MIN_SPEEDUP_FUSED_VS_XLA = 1.7

WARMUP = 5
STEPS_PER_ROUND = 30
ROUNDS = 4

# model config, batch construction, and BATCH/SEQ/... constants come from
# bench.py — the guard protects exactly the configuration the bench measures
import bench  # noqa: E402

BATCH = bench.BATCH


def build_trainer(use_fused_layer, use_fused_loss, steps_per_call=1):
    return bench.build(
        dict(use_fused_layer=use_fused_layer,
             use_fused_loss=use_fused_loss),
        steps_per_call=steps_per_call)


make_batch = bench.make_batch


def _parse(argv):
    parser = argparse.ArgumentParser()
    parser.add_argument("--numerics", action="store_true",
                        help="run kernel numerics checks first")
    parser.add_argument("--json-out", default=None)
    parser.add_argument("--no-retry", action="store_true",
                        help="fail immediately on a budget miss instead "
                             "of re-measuring once in a fresh process")
    parser.add_argument("--worker", action="store_true",
                        help="internal: run one measurement pass in THIS "
                             "process (which claims the TPU) and emit the "
                             "report; budget verdict + retry live in the "
                             "jax-free orchestrator")
    return parser.parse_args(argv)


def main(argv=None):
    args = _parse(argv)
    if not args.worker:
        return orchestrate(args)

    import jax
    assert jax.devices()[0].platform == "tpu", (
        "perf_guard measures real hardware; run it on the TPU "
        f"(got {jax.devices()})")

    import numpy as np
    variants = {
        "xla": build_trainer(False, False),
        "xla_multi4": build_trainer(False, False, steps_per_call=4),
        "fused_layer": build_trainer(True, False),
        "fused_full": build_trainer(True, True),
        "fused_multi4": build_trainer(True, True, steps_per_call=4),
        "sasrec_multi4": bench.build(
            dict(use_fused_layer=True, use_fused_loss=True,
                 causal_attention=True),
            steps_per_call=4),
        # ML-20M scale: 26.7k vocab routes through the vocab-tiled
        # flash-softmax loss (ml-20m_256 encoder dims)
        "ml20m_tiled": bench.build(
            dict(vocab_size=26732, hidden_size=256, num_attention_heads=8,
                 inner_dim=1024, use_fused_layer=True, use_fused_loss=True),
            steps_per_call=4),
        # Reddit scale: 335k vocab through the same tiled loss (reddit_128
        # encoder dims); the XLA logits path cannot run here at all
        "reddit_tiled": bench.build(
            dict(vocab_size=335423, use_fused_layer=True,
                 use_fused_loss=True),
            steps_per_call=4),
        # temporal family: recency embeddings + relative-time bias built
        # dense once per step (one-hot-matmul lookup) and STREAMED through
        # the fused layer kernel. No timestamps in the guard batch (bucket
        # matrix all-zeros) — the one-hot contraction, the per-cell bias
        # DMA and the transposed-one-hot table gradient all cost the same
        # regardless of bucket VALUES, which is what the budget protects
        "temporal_multi4": bench.build(
            dict(use_fused_layer=True, use_fused_loss=True,
                 use_temporal_embeddings=True, use_temporal_attention=True),
            steps_per_call=4),
        # reference-default encoder scale: hidden 768, 12 layers, S=512,
        # flash attention, NO remat (25% faster at B=32 — see BUDGET_MS
        # note), XLA loss (vocab 3709 is logits-cheap; the encoder is
        # what this variant measures)
        "bert_base_512": bench.build(
            dict(hidden_size=768, num_layers=12, num_attention_heads=12,
                 inner_dim=3072, max_sequence_length=512,
                 max_predictions_per_seq=76, use_fused_layer=False,
                 use_fused_loss=False, use_flash_attention=True,
                 remat=False),
            steps_per_call=1),
    }
    # per-variant batch dims where they differ from the bench defaults
    # (vocab, seq, npred, batch)
    VARIANT_DIMS = {
        "ml20m_tiled": (26732, bench.SEQ, bench.NPRED, BATCH),
        "reddit_tiled": (335423, bench.SEQ, bench.NPRED, BATCH),
        "bert_base_512": (bench.VOCAB, 512, 76, 32),
    }
    # the 12-layer S=512 variant runs ~20x slower per step; fewer timed
    # steps keep the guard's wall clock sane without hurting min-of-rounds
    VARIANT_STEPS = {"bert_base_512": 6}
    alt_batches = {}

    def batches_for(name):
        if name not in VARIANT_DIMS:
            return batches, stacks
        if name not in alt_batches:
            old = (bench.VOCAB, bench.SEQ, bench.NPRED, bench.BATCH)
            bench.VOCAB, bench.SEQ, bench.NPRED, bench.BATCH = \
                VARIANT_DIMS[name]
            bs = [make_batch(s) for s in range(4)]
            bench.VOCAB, bench.SEQ, bench.NPRED, bench.BATCH = old
            st = [{key: np.stack([bs[(i + j) % 4][key] for j in range(4)])
                   for key in bs[0]} for i in range(2)]
            alt_batches[name] = (bs, st)
        return alt_batches[name]

    batches = [make_batch(s) for s in range(4)]
    stacks = [{key: np.stack([batches[(i + j) % 4][key] for j in range(4)])
               for key in batches[0]} for i in range(2)]

    def run_steps(trainer, n, name="xla"):
        bs, st = batches_for(name)
        k = trainer.steps_per_call
        if k > 1:
            for i in range(n // k):
                trainer.state, logs = trainer._train_multi_fn(
                    trainer.state, st[i % len(st)])
            return {"loss": logs["loss"][-1]}
        for i in range(n):
            trainer.state, logs = trainer._train_step_fn(
                trainer.state, bs[i % len(bs)])
        return logs

    # compile + warm every variant before any timing
    for name, tr in variants.items():
        logs = run_steps(tr, max(WARMUP, tr.steps_per_call), name)
        float(jax.device_get(logs["loss"]))

    best_ms = {name: float("inf") for name in variants}
    for _ in range(ROUNDS):
        for name, tr in variants.items():
            k = tr.steps_per_call
            n_exec = (VARIANT_STEPS.get(name, STEPS_PER_ROUND) // k) * k
            t0 = time.perf_counter()
            logs = run_steps(tr, n_exec, name)
            float(jax.device_get(logs["loss"]))  # honest barrier
            ms = (time.perf_counter() - t0) * 1000 / n_exec
            best_ms[name] = min(best_ms[name], ms)

    speedup = best_ms["xla_multi4"] / best_ms["fused_multi4"]
    batch_of = {name: VARIANT_DIMS.get(name, (0, 0, 0, BATCH))[3]
                for name in variants}
    report = {
        "ms_per_step": {k: round(v, 3) for k, v in best_ms.items()},
        "examples_per_sec": {k: round(batch_of[k] / v * 1000, 1)
                             for k, v in best_ms.items()},
        "fused_speedup_vs_xla": round(speedup, 3),
        "budgets_ms": BUDGET_MS,
    }
    print(json.dumps(report))
    if args.json_out:
        pathlib.Path(args.json_out).write_text(
            json.dumps(report, indent=2) + "\n")

    if args.numerics:
        # AFTER the timing (the numerics suite's eager finite-difference
        # loops inflate subsequent same-process measurements ~25%)
        import verify_kernels_on_tpu as vk
        checks = ["main", "verify_fused_layer", "verify_tiled_loss",
                  "verify_tiled_loss_reddit", "verify_tiled_loss_bf16",
                  "verify_flash_bert_base_shape", "verify_fused_temporal"]
        # a numerics crash must still leave self-documenting evidence: the
        # measurements are already written above, and the failing check is
        # recorded in the artifact before the exception propagates
        # (ADVICE r3); the orchestrator then applies the perf verdict to
        # the partial report so a perf regression is still printed
        try:
            for name in checks:
                getattr(vk, name)()
        except BaseException as e:
            report["numerics"] = {"status": "failed", "check": name,
                                  "error": f"{type(e).__name__}: {e}"}
            if args.json_out:
                pathlib.Path(args.json_out).write_text(
                    json.dumps(report, indent=2) + "\n")
            print(f"[perf_guard] kernel numerics FAILED in {name}",
                  file=sys.stderr)
            raise
        # record the chain in the artifact so each round's evidence shows
        # the on-chip kernel numerics (incl. hardware-only PRNG/dropout
        # paths that interpret mode cannot validate) actually ran
        report["numerics"] = {"status": "ok", "checks": checks}
        if args.json_out:
            pathlib.Path(args.json_out).write_text(
                json.dumps(report, indent=2) + "\n")
        print("[perf_guard] kernel numerics OK")
    return 0


def _verdict(ms, sp):
    fails = [f"{name}: {ms[name]:.2f} ms > budget {budget} ms"
             for name, budget in BUDGET_MS.items()
             if ms[name] > budget]
    if sp < MIN_SPEEDUP_FUSED_VS_XLA:
        fails.append(
            f"fused speedup {sp:.2f}x < {MIN_SPEEDUP_FUSED_VS_XLA}x")
    return fails


def _run_worker(numerics, json_path):
    """One measurement pass in a fresh subprocess (the only TPU claimant
    — the orchestrator never imports jax, so serial-access discipline
    holds; CLAUDE.md TPU rules). Returns (report|None, returncode)."""
    import subprocess
    argv = [sys.executable, __file__, "--worker", "--json-out", json_path]
    if numerics:
        argv.append("--numerics")
    try:
        proc = subprocess.run(argv, text=True, timeout=3600)
    except subprocess.TimeoutExpired:
        # the tunnel's documented wedge mode: a claimed process that
        # produces nothing forever — fail cleanly, don't traceback
        print("[perf_guard] measurement worker hit the 3600s deadline "
              "(wedged TPU claim)", file=sys.stderr)
        return None, 1
    try:
        report = json.loads(pathlib.Path(json_path).read_text())
    except (OSError, json.JSONDecodeError):
        report = None
    return report, proc.returncode


def orchestrate(args):
    """jax-free driver: spawn a measurement worker, apply the budget
    verdict, and on a miss re-measure once in a second fresh process
    after a cool-down, taking the per-variant min of the two independent
    draws — the tunnel's drift bursts are PER-PROCESS and won't strike
    twice, while a genuine regression fails both (see BUDGET_MS note)."""
    import tempfile
    out = pathlib.Path(args.json_out) if args.json_out else None
    with tempfile.TemporaryDirectory() as td:
        first_path = str(pathlib.Path(td) / "first.json")
        report, rc = _run_worker(args.numerics, first_path)
        if report is None:
            print("[perf_guard] measurement worker produced no report "
                  f"(rc={rc})", file=sys.stderr)
            return rc or 1
        if out:
            out.write_text(json.dumps(report, indent=2) + "\n")
        numerics_failed = (args.numerics and
                           report.get("numerics", {}).get("status") != "ok")

        failures = _verdict(report["ms_per_step"],
                            report["fused_speedup_vs_xla"])
        if failures and not args.no_retry and not numerics_failed:
            print("[perf_guard] budget miss — re-measuring in a fresh "
                  f"process after cool-down: {'; '.join(failures)}",
                  flush=True)
            time.sleep(90)
            retry_path = str(pathlib.Path(td) / "retry.json")
            second, _ = _run_worker(False, retry_path)
            if second is None:
                print("[perf_guard] retry worker produced no report",
                      file=sys.stderr)
            else:
                report["first_attempt_ms_per_step"] = dict(
                    report["ms_per_step"])
                report["retry_ms_per_step"] = second["ms_per_step"]
                report["ms_per_step"] = {
                    k: min(v, second["ms_per_step"][k])
                    for k, v in report["ms_per_step"].items()}
                # recompute the speedup from the merged ms values rather
                # than taking max() of the per-process ratios — the
                # published (ms, speedup) pair must be internally
                # consistent, not a cross-process mix (ADVICE r4)
                report["fused_speedup_vs_xla"] = round(
                    report["ms_per_step"]["xla_multi4"]
                    / report["ms_per_step"]["fused_multi4"], 3)
                failures = _verdict(report["ms_per_step"],
                                    report["fused_speedup_vs_xla"])
        if failures:
            # classify before failing: the tunnel's SUSTAINED degraded
            # states (CLAUDE.md "chip-state drift") inflate the small
            # (<25 ms) Mosaic paths while the XLA path and the large
            # kernels (reddit_tiled, bert_base_512) stay at their healthy
            # values. If that exact signature holds across both draws,
            # record it — a human reading a red run needs to know whether
            # to suspect the code or the chip.
            ms = report["ms_per_step"]
            stable = (ms["xla"] <= 21.0 and
                      ms["reddit_tiled"] <= BUDGET_MS["reddit_tiled"] and
                      ms["bert_base_512"] <= BUDGET_MS["bert_base_512"])
            only_small_inflated = all(
                f.split(":")[0] in ("fused_full", "fused_layer",
                                    "fused_multi4", "sasrec_multi4",
                                    "ml20m_tiled", "temporal_multi4")
                or f.startswith("fused speedup") for f in failures)
            if stable and only_small_inflated:
                report["drift_burst_suspected"] = (
                    "XLA path and large kernels at healthy values while "
                    "only small Mosaic paths inflated across two "
                    "independent processes — the documented chip-state "
                    "drift signature, not a code regression; re-run "
                    "after the tunnel recovers")
        print(json.dumps(report))
        if out:
            out.write_text(json.dumps(report, indent=2) + "\n")

    if failures:
        print("[perf_guard] REGRESSION:", "; ".join(failures),
              file=sys.stderr)
        if report.get("drift_burst_suspected"):
            print("[perf_guard] NOTE: drift-burst signature — "
                  + report["drift_burst_suspected"], file=sys.stderr)
    if numerics_failed:
        check = report["numerics"].get("check")
        print(f"[perf_guard] kernel numerics FAILED in {check}",
              file=sys.stderr)
    if failures or numerics_failed:
        return 1
    print("[perf_guard] OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
