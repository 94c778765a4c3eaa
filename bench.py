"""Benchmark: ML-1M-shaped training throughput (examples/s) on the current
accelerator vs the same step on host CPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "examples/s", "vs_baseline": R}

``vs_baseline`` is accelerator-throughput / CPU-throughput of the identical
jitted train step — the BASELINE.json north star is >=5x the (single-host
CPU) reference, and the reference publishes no numbers of its own
(BASELINE.md), so the CPU run of our own step is the comparable stand-in.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = 256
SEQ = 200
NPRED = 40
VOCAB = 3709  # ML-1M vocab + specials
WARMUP_STEPS = 5
MEASURE_STEPS_DEVICE = 100
MEASURE_STEPS_CPU = 3


def build(model_cfg_overrides=None):
    import jax
    from bert4rec_tpu.core.dtypes import DTypePolicy, enable_fast_prng
    enable_fast_prng()
    from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
    from bert4rec_tpu.trainers import BERT4RecTrainer, optimizers

    cfg_kwargs = dict(
        vocab_size=VOCAB, hidden_size=128, num_layers=2,
        num_attention_heads=4, inner_dim=512, max_sequence_length=SEQ,
        attention_dropout=0.2, output_dropout=0.5,
        max_predictions_per_seq=NPRED,
        # fused Pallas attention (1.27x measured on v5e); falls back to the
        # identical-math XLA path on CPU
        use_flash_attention=jax.devices()[0].platform == "tpu")
    cfg_kwargs.update(model_cfg_overrides or {})
    config = BERT4RecConfig(**cfg_kwargs)
    model = BERT4RecModel(config=config, dtype_policy=DTypePolicy.bf16())
    trainer = BERT4RecTrainer(model)
    trainer.initialize_model(
        optimizer=optimizers.create_adam_w_optimizer(),
        rng=jax.random.key(0))
    return trainer


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, VOCAB, size=(BATCH, SEQ)).astype(np.int32)
    positions = np.stack([
        np.sort(rng.choice(SEQ, size=NPRED, replace=False))
        for _ in range(BATCH)]).astype(np.int32)
    return {
        "input_word_ids": ids,
        "input_mask": np.ones((BATCH, SEQ), np.int32),
        "masked_lm_positions": positions,
        "masked_lm_ids": np.take_along_axis(ids, positions, axis=1),
        "masked_lm_weights": np.ones((BATCH, NPRED), np.int32),
    }


def measure(trainer, steps):
    import jax
    batches = [make_batch(s) for s in range(4)]
    # warmup / compile; device_get = hard host sync (block_until_ready is
    # not a reliable barrier on the tunneled TPU platform)
    for i in range(WARMUP_STEPS):
        trainer.state, logs = trainer._train_step_fn(
            trainer.state, batches[i % len(batches)])
    float(jax.device_get(logs["loss"]))
    t0 = time.perf_counter()
    for i in range(steps):
        trainer.state, logs = trainer._train_step_fn(
            trainer.state, batches[i % len(batches)])
    float(jax.device_get(logs["loss"]))
    dt = time.perf_counter() - t0
    return BATCH * steps / dt


def run_cpu_baseline():
    """Measure the identical step on host CPU in a subprocess."""
    import subprocess
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, __file__, "--cpu-worker"],
        capture_output=True, text=True, env=env, timeout=1800,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    for line in out.stdout.splitlines():
        if line.startswith("CPU_THROUGHPUT "):
            return float(line.split()[1])
    sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
    return None


def main():
    if "--cpu-worker" in sys.argv:
        # the TPU plugin registers itself regardless of JAX_PLATFORMS;
        # jax.config wins over it
        import jax
        jax.config.update("jax_platforms", "cpu")
        assert jax.devices()[0].platform == "cpu"
        trainer = build()
        print("CPU_THROUGHPUT", measure(trainer, MEASURE_STEPS_CPU))
        return

    import jax
    platform = jax.devices()[0].platform
    trainer = build()
    value = measure(trainer, MEASURE_STEPS_DEVICE)

    if platform == "cpu":
        cpu_value = value
    else:
        cpu_value = run_cpu_baseline()
    vs_baseline = value / cpu_value if cpu_value else 1.0

    print(json.dumps({
        "metric": f"ml1m_128_train_examples_per_sec_{platform}",
        "value": round(value, 2),
        "unit": "examples/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
