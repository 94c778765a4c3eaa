"""MFU roofline for the reference-default encoder scale (VERDICT r3 weak
#4): hidden 768, 12 layers, 12 heads, S=512 — reference
bert4rec_encoder.py:62-79 defaults — at B=32 on one v5e core.

Measures four variants interleaved in ONE process (min-of-rounds; the
tunnel's cross-process variance is ±30%):

    remat_k1    — remat + flash attention, single-step dispatch
                  (the configuration PERF guards as ``bert_base_512``)
    remat_k4    — same under 4-step lax.scan dispatch
    noremat_k1  — no remat (flash still recomputes scores in ITS backward;
                  remat on top re-runs the whole layer forward)
    noremat_k4  — no remat + 4-step dispatch

and prints one JSON report with the analytic FLOP count and MFU per
variant.

FLOP accounting (per token, per layer; matmul = 2mnk):
    qkv        2*H*3H          = 3.54 MF
    attn out   2*H*H           = 1.18 MF
    scores+ctx 2*(2*S*H)       = 1.57 MF   (full S; flash tiles it)
    ffn        2*(2*H*F)       = 9.44 MF
    total      15.73 MF * 12 layers = 188.8 MF/token
    * 16384 tokens = 3.09 TF forward; backward ~2x forward.
Training step (model math, the MFU numerator): 9.28 TF. Recompute
(remat full-layer re-forward, flash bwd score rebuild) is counted as
overhead, not useful work. v5e bf16 peak: 197 TF/s.
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

B, S, H, F, L = 32, 512, 768, 3072, 12
NPRED = 76
PEAK_TFLOPS = 197.0

WARMUP = 3
STEPS_PER_ROUND = 8
ROUNDS = 4


def train_flops():
    per_token_layer = (2 * H * 3 * H) + (2 * H * H) + (2 * 2 * S * H) \
        + 2 * (2 * H * F)
    fwd = per_token_layer * L * B * S
    # MLM head at the masked positions only
    head = 2 * H * bench.VOCAB * B * NPRED
    return 3 * (fwd + head)  # fwd + ~2x bwd


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--json-out", default=None)
    parser.add_argument("--extended", action="store_true",
                        help="ablation variants around the no-remat anchor "
                             "(xla attention, fused loss, no dropout, "
                             "6-head cells) instead of the remat/K matrix")
    parser.add_argument("--batch-sweep", action="store_true",
                        help="per-chip batch scaling at this scale: "
                             "no-remat B=32/64, remat B=64/128/256 — the "
                             "throughput-optimal operating point")
    parser.add_argument("--decompose", action="store_true",
                        help="MEASURED step decomposition (VERDICT r4 #5): "
                             "nested measurement-only kernel ablations "
                             "(drop the softmax pipeline, drop the softmax "
                             "jacobian, drop attention entirely) whose "
                             "pairwise deltas split the step into softmax "
                             "/ jacobian / attention-matmul / rest pieces "
                             "that sum to the anchor by construction")
    parser.add_argument("--batch", type=int, default=None,
                        help="override the measurement batch size")
    args = parser.parse_args(argv)
    global B
    if args.batch:
        B = args.batch

    import jax
    assert jax.devices()[0].platform == "tpu", jax.devices()

    import numpy as np

    def build(remat, k, **over):
        cfg = dict(hidden_size=H, num_layers=L, num_attention_heads=12,
                   inner_dim=F, max_sequence_length=S,
                   max_predictions_per_seq=NPRED, use_fused_layer=False,
                   use_fused_loss=False, use_flash_attention=True,
                   remat=remat)
        cfg.update(over)
        return bench.build(cfg, steps_per_call=k)

    _batch_cache = {}

    def batches_for(bsz):
        if bsz not in _batch_cache:
            old = (bench.SEQ, bench.NPRED, bench.BATCH)
            bench.SEQ, bench.NPRED, bench.BATCH = S, NPRED, bsz
            bs = [bench.make_batch(s) for s in range(4)]
            bench.SEQ, bench.NPRED, bench.BATCH = old
            st = [{key: np.stack([bs[(i + j) % 4][key] for j in range(4)])
                   for key in bs[0]} for i in range(2)]
            _batch_cache[bsz] = (bs, st)
        return _batch_cache[bsz]

    def run_steps(tr, n, bsz=B):
        bs, st = batches_for(bsz)
        k = tr.steps_per_call
        if k > 1:
            for i in range(n // k):
                tr.state, logs = tr._train_multi_fn(tr.state, st[i % 2])
            return {"loss": logs["loss"][-1]}
        for i in range(n):
            tr.state, logs = tr._train_step_fn(tr.state, bs[i % 4])
        return logs

    failed = {}
    best_ms = {}
    batch_of = {}

    def warmup(name, tr, bsz=B):
        batch_of[name] = bsz
        try:
            logs = run_steps(tr, max(WARMUP, tr.steps_per_call), bsz)
            float(jax.device_get(logs["loss"]))
            print(f"[roofline] {name} compiled", flush=True)
            return True
        except Exception as e:  # noqa: BLE001 — an experimental variant
            # (hpc6 Mosaic VMEM, xla-attention HBM) must not kill the run
            failed[name] = f"{type(e).__name__}: {str(e)[:200]}"
            print(f"[roofline] {name} FAILED: {failed[name]}", flush=True)
            return False

    def measure_round(name, tr, bsz=B):
        k = tr.steps_per_call
        n = (STEPS_PER_ROUND // k) * k
        t0 = time.perf_counter()
        logs = run_steps(tr, n, bsz)
        float(jax.device_get(logs["loss"]))
        ms = (time.perf_counter() - t0) * 1000 / n
        best_ms[name] = min(best_ms.get(name, float("inf")), ms)

    if args.decompose:
        # ---- measured step decomposition ------------------------------
        # Four nested variants, dropout OFF everywhere (its cost is
        # measured separately by --extended's nodrop ablation). Each
        # patched variant compiles its jitted step WHILE the measurement-
        # only kernel patch is active; once compiled, the trace is
        # frozen, so all four coexist and interleave cleanly.
        #
        #   V0 smax   — the real kernel (anchor, no dropout)
        #   V1 nosmax — softmax pipeline removed: probs = masked scaled
        #               scores (no rowmax/exp/rowsum/normalize) in BOTH
        #               the forward and the backward's recompute;
        #               jacobian kept. V0-V1 = the softmax pipeline.
        #   V2 nojac  — additionally dS = dP (softmax jacobian's
        #               two [S,S] passes + rowsum removed). V1-V2 = jac.
        #   V3 noattn — flash_attention replaced by o = v (identity):
        #               all six attention matmuls + the mask pass gone.
        #               V2-V3 = attention matmuls; V3 = everything else
        #               (qkv/out-proj/FFN matmuls, LN, gelu, embeddings,
        #               MLM head, optimizer).
        #
        # The deltas sum to V0 by construction — an auditable 100%
        # accounting, not pass-count arithmetic.
        import contextlib

        import jax.numpy as jnp

        # NB: ops/__init__.py re-exports a FUNCTION named
        # flash_attention, which shadows the submodule as a package
        # attribute — `import ... as fa` resolves through getattr and
        # binds the function. Take the module from sys.modules.
        import bert4rec_tpu.ops.flash_attention  # noqa: F401
        fa = sys.modules["bert4rec_tpu.ops.flash_attention"]

        def probs_nosmax(q, k, mask, scale, causal):
            s_mat = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            # keep the mask pass (it survives in every real variant);
            # use a multiplicative mask so values stay finite without
            # the exp that would normally absorb the -inf bias
            return s_mat * jnp.where(mask > 0, 1.0, 0.0)[None, :]

        def bwd_nojac(seed_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, *, scale, dropout_rate,
                      n_heads, hpc, causal):
            mask = mask_ref[fa.pl.program_id(0)]
            for h in range(hpc):
                q, k, v = q_ref[0, h], k_ref[0, h], v_ref[0, h]
                do = do_ref[0, h].astype(jnp.float32)
                p = fa._probs(q, k, mask, scale, causal)
                dv = jax.lax.dot_general(
                    p.astype(v.dtype), do.astype(v.dtype),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dd = jax.lax.dot_general(
                    do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ds = dd.astype(q.dtype)          # jacobian dropped
                dq = jax.lax.dot_general(
                    ds, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                dk = jax.lax.dot_general(
                    ds, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                dq_ref[0, h] = dq.astype(dq_ref.dtype)
                dk_ref[0, h] = dk.astype(dk_ref.dtype)
                dv_ref[0, h] = dv.astype(dv_ref.dtype)

        def flash_identity(q, k, v, mask, *a, **kw):
            return v.astype(q.dtype)

        @contextlib.contextmanager
        def patched(**attrs):
            saved = {k: getattr(fa, k) for k in attrs}
            try:
                for k, val in attrs.items():
                    setattr(fa, k, val)
                yield
            finally:
                for k, val in saved.items():
                    setattr(fa, k, val)

        nodrop = dict(attention_dropout=0.0, output_dropout=0.0)
        variants = []
        anchor = build(False, 1, **nodrop)
        if not warmup("smax", anchor):
            raise SystemExit("anchor failed to compile")
        variants.append(("smax", anchor))

        with patched(_probs=probs_nosmax):
            tr = build(False, 1, **nodrop)
            if warmup("nosmax", tr):
                variants.append(("nosmax", tr))
        with patched(_probs=probs_nosmax, _bwd_kernel=bwd_nojac):
            tr = build(False, 1, **nodrop)
            if warmup("nojac", tr):
                variants.append(("nojac", tr))
        with patched(flash_attention=flash_identity):
            tr = build(False, 1, **nodrop)
            if warmup("noattn", tr):
                variants.append(("noattn", tr))

        for _ in range(ROUNDS):
            for name, tr in variants:
                measure_round(name, tr)
    elif args.extended:
        # diagnostic ablations, each interleaved PAIRWISE against the
        # resident no-remat anchor: one extra trainer lives at a time
        # (anchor + variant + no-remat activations is the HBM ceiling at
        # B=32 — seven resident trainers OOM'd a v5e)
        anchor = build(False, 1)
        if not warmup("noremat_k1", anchor):
            raise SystemExit("anchor failed to compile")

        def ablations():
            yield "noremat_xla_attn", dict(use_flash_attention=False)
            yield "noremat_fused_loss", dict(use_fused_loss=True)
            yield "noremat_nodrop", dict(attention_dropout=0.0,
                                         output_dropout=0.0)
            # larger head groups per grid cell (hpc 4 -> 6): fewer cells,
            # more VMEM; the estimate (12*S^2*4 + 8*hpc*S*D*2) = 15.7 MB
            # at hpc=6 — inside the 16 MB ceiling but outside the
            # calibrated safety margin: an experiment, not a default
            from bert4rec_tpu.ops import flash_attention as fa
            saved_budget = fa._VMEM_BUDGET
            fa._VMEM_BUDGET = int(15.8 * 1024 * 1024)
            try:
                yield "noremat_hpc6", {}
            finally:
                fa._VMEM_BUDGET = saved_budget

        for name, over in ablations():
            try:
                tr = build(False, 1, **over)
            except Exception as e:  # noqa: BLE001
                failed[name] = f"{type(e).__name__}: {str(e)[:200]}"
                print(f"[roofline] {name} FAILED to build: "
                      f"{failed[name]}", flush=True)
                continue
            if warmup(name, tr):
                for _ in range(ROUNDS):
                    measure_round(name, tr)
                    measure_round("noremat_k1", anchor)
            del tr
    elif args.batch_sweep:
        # throughput-optimal operating point: larger per-chip batches
        # amortize the per-cell kernel overheads and the fixed VPU
        # passes; remat trades a 33% recompute tax for O(1)-layer
        # activations where the no-remat working set no longer fits HBM.
        # Each point measured pairwise vs the resident B=32 anchor.
        anchor = build(False, 1)
        if not warmup("noremat_b32", anchor, 32):
            raise SystemExit("anchor failed to compile")
        for name, remat, bsz in [("noremat_b64", False, 64),
                                 ("remat_b64", True, 64),
                                 ("remat_b128", True, 128),
                                 ("remat_b256", True, 256)]:
            tr = build(remat, 1)
            if warmup(name, tr, bsz):
                for _ in range(ROUNDS):
                    measure_round(name, tr, bsz)
                    measure_round("noremat_b32", anchor, 32)
            del tr
    else:
        variants = {
            "remat_k1": build(True, 1),
            "remat_k4": build(True, 4),
            "noremat_k1": build(False, 1),
            "noremat_k4": build(False, 4),
        }
        for name, tr in list(variants.items()):
            if not warmup(name, tr):
                del variants[name]
        for _ in range(ROUNDS):
            for name, tr in variants.items():
                measure_round(name, tr)

    tf = train_flops() / 1e12  # at the reference B=32; scaled per variant
    report = {
        "config": {"batch": B, "seq": S, "hidden": H, "layers": L,
                   "inner_dim": F, "npred": NPRED},
        "train_tflops_analytic": round(tf, 3),
        "peak_tflops_bf16": PEAK_TFLOPS,
        "ms_per_step": {k: round(v, 2) for k, v in best_ms.items()},
        "examples_per_sec": {k: round(batch_of[k] / v * 1000, 1)
                             for k, v in best_ms.items()},
        "mfu": {k: round(tf * batch_of[k] / B / (v / 1000) / PEAK_TFLOPS, 4)
                for k, v in best_ms.items()},
    }
    if failed:
        report["failed_variants"] = failed
    if args.decompose and all(k in best_ms for k in
                              ("smax", "nosmax", "nojac", "noattn")):
        report["decomposition_ms"] = {
            "softmax_pipeline": round(best_ms["smax"] - best_ms["nosmax"],
                                      2),
            "softmax_jacobian": round(best_ms["nosmax"] - best_ms["nojac"],
                                      2),
            "attention_matmuls": round(best_ms["nojac"] - best_ms["noattn"],
                                       2),
            "rest": round(best_ms["noattn"], 2),
            "sums_to_anchor": round(best_ms["smax"], 2),
        }
    print(json.dumps(report))
    if args.json_out:
        pathlib.Path(args.json_out).write_text(
            json.dumps(report, indent=2) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
