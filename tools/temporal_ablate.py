"""Attribute the temporal-family step overhead piece by piece (v5e).

The temporal step = non-temporal fused step + (a) dense rel-bias build
(bucket matrix + table lookup), (b) rel streaming through the fused
layer kernels, (c) the lookup VJP (dtable scatter). This tool times each
piece interleaved in ONE process, plus candidate implementations of (a)
and (c), so the roofline section in docs/ARCHITECTURE.md cites measured
numbers instead of guesses:

    python tools/temporal_ablate.py --json-out /tmp/temporal_ablate.json
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

B, S, NH, NB = 256, 200, 4, 64

WARMUP = 3
REPS = 20
ROUNDS = 4


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--json-out", default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.devices()[0].platform == "tpu", jax.devices()

    from bert4rec_tpu.models.components.networks.bert4rec_encoder import (
        Bert4RecEncoder,
    )

    rng = np.random.default_rng(0)
    ts = jnp.asarray((1_600_000_000 + np.cumsum(
        rng.integers(60, 500_000, size=(B, S)), axis=1)).astype(np.int32))
    mask = jnp.ones((B, S), jnp.int32)
    table = jnp.asarray(rng.normal(size=(NB, NH)).astype(np.float32) * 0.3)
    bucket = jax.jit(lambda t, m: Bert4RecEncoder._time_bucket_matrix(
        t, m, NB))(ts, mask)
    g4 = jnp.asarray(rng.normal(size=(B, S, S, NH)).astype(np.float32))

    # ---- candidate implementations --------------------------------- #

    def build_take(table, bucket):
        """jnp.take + transpose — the encoder's current forward build."""
        rel = jnp.take(table, bucket, axis=0)
        return rel.transpose(0, 3, 1, 2)

    def build_onehot(table, bucket):
        """one-hot matmul on the MXU (bf16 indicator, fp32 accum)."""
        oh = (bucket[..., None] == jnp.arange(NB)).astype(jnp.bfloat16)
        rel = jax.lax.dot_general(
            oh, table.astype(jnp.bfloat16), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return rel.transpose(0, 3, 1, 2)

    def vjp_masked(bucket, g4):
        """64 sibling masked reductions (the current custom VJP)."""
        rows = [jnp.sum(jnp.where((bucket == k)[..., None], g4, 0.0),
                        axis=(0, 1, 2)) for k in range(NB)]
        return jnp.stack(rows)

    def vjp_onehot_f32(bucket, g4):
        oh = (bucket[..., None] == jnp.arange(NB)).astype(jnp.float32)
        return jax.lax.dot_general(
            oh.reshape(-1, NB), g4.reshape(-1, NH),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def vjp_onehot_bf16(bucket, g4):
        oh = (bucket[..., None] == jnp.arange(NB)).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            oh.reshape(-1, NB), g4.reshape(-1, NH).astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def vjp_segment(bucket, g4):
        return jax.ops.segment_sum(g4.reshape(-1, NH), bucket.reshape(-1),
                                   num_segments=NB)

    fns = {
        "bucket_matrix": (
            jax.jit(lambda t, m: Bert4RecEncoder._time_bucket_matrix(
                t, m, NB)), (ts, mask)),
        "build_take": (jax.jit(build_take), (table, bucket)),
        "build_onehot": (jax.jit(build_onehot), (table, bucket)),
        "vjp_masked64": (jax.jit(vjp_masked), (bucket, g4)),
        "vjp_onehot_f32": (jax.jit(vjp_onehot_f32), (bucket, g4)),
        "vjp_onehot_bf16": (jax.jit(vjp_onehot_bf16), (bucket, g4)),
        "vjp_segment_sum": (jax.jit(vjp_segment), (bucket, g4)),
    }

    # numeric agreement of the VJP candidates
    ref = np.asarray(fns["vjp_masked64"][0](bucket, g4))
    for name in ("vjp_onehot_f32", "vjp_onehot_bf16", "vjp_segment_sum"):
        out = np.asarray(fns[name][0](bucket, g4))
        rel_err = np.abs(out - ref).max() / np.abs(ref).max()
        print(f"[ablate] {name} rel err vs masked64: {rel_err:.2e}",
              flush=True)

    for name, (fn, xs) in fns.items():
        r = fn(*xs)
        jnp.sum(r if isinstance(r, jnp.ndarray) else r[0]).block_until_ready()
        float(jax.device_get(jnp.sum(r)))
        print(f"[ablate] {name} compiled", flush=True)

    best_ms = {name: float("inf") for name in fns}
    for _ in range(ROUNDS):
        for name, (fn, xs) in fns.items():
            t0 = time.perf_counter()
            for _ in range(REPS):
                r = fn(*xs)
            float(jax.device_get(jnp.sum(r)))
            ms = (time.perf_counter() - t0) * 1000 / REPS
            best_ms[name] = min(best_ms[name], ms)

    report = {"shape": {"B": B, "S": S, "heads": NH, "buckets": NB},
              "ms": {k: round(v, 3) for k, v in best_ms.items()}}
    print(json.dumps(report))
    if args.json_out:
        pathlib.Path(args.json_out).write_text(
            json.dumps(report, indent=2) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
