"""Online-serving benchmark: latency/throughput through the micro-batched
HTTP stack on the current accelerator.

Builds an ML-1M-shaped model (vocab 3709, hidden 128, 2 layers, S=200),
starts ``apps.ServingServer`` on localhost, and drives it with concurrent
closed-loop HTTP clients. Reports one JSON line:

    {"histories_per_sec": ..., "p50_ms": ..., "p99_ms": ...,
     "batches": ..., "mean_batch_fill": ...}

Usage:
    python tools/serving_bench.py [--clients 16] [--requests 400]
                                  [--capacity 32] [--wait-ms 2]
"""

import argparse
import http.client
import json
import pathlib
import sys
import threading
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

VOCAB_ITEMS = 3706   # ML-1M catalog (golden vocab size)
SEQ = 200
HISTORY_LEN = 20


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=400)
    p.add_argument("--capacity", type=int, default=32)
    p.add_argument("--wait-ms", type=float, default=2.0)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (offline smoke); the axon "
                        "TPU plugin ignores JAX_PLATFORMS, jax.config wins")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from bert4rec_tpu.apps import (
        Recommender, RecommenderService, ServingServer,
    )
    from bert4rec_tpu.core.dtypes import DTypePolicy
    from bert4rec_tpu.dataloaders import BERT4RecDataloader
    from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel

    on_tpu = jax.devices()[0].platform == "tpu"
    dataloader = BERT4RecDataloader(max_seq_len=SEQ,
                                    max_predictions_per_seq=40)
    items = [f"movie {i}" for i in range(VOCAB_ITEMS)]
    dataloader.generate_vocab(items)
    config = BERT4RecConfig(
        vocab_size=dataloader.tokenizer.get_vocab_size(), hidden_size=128,
        num_layers=2, num_attention_heads=4, inner_dim=512,
        max_sequence_length=SEQ, max_predictions_per_seq=40,
        use_fused_layer=on_tpu)
    model = BERT4RecModel(config=config,
                          dtype_policy=DTypePolicy.bf16() if on_tpu
                          else None)
    params = model.init(jax.random.key(0))

    recommender = Recommender(model, params, dataloader)
    service = RecommenderService(recommender, max_k=args.k,
                                 batch_capacity=args.capacity,
                                 max_wait_ms=args.wait_ms)
    server = ServingServer(service, port=0).start()

    rng = np.random.default_rng(0)
    histories = [[items[j] for j in rng.choice(VOCAB_ITEMS, HISTORY_LEN,
                                               replace=False)]
                 for _ in range(64)]

    def post(history):
        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=120)
        try:
            conn.request("POST", "/v1/recommend",
                         body=json.dumps({"history": history, "k": args.k}),
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            body = json.loads(resp.read())
            assert resp.status == 200, body
            return body
        finally:
            conn.close()

    post(histories[0])  # compile + warm

    latencies = []
    lock = threading.Lock()
    # distribute the remainder so every requested request is actually sent
    base, rem = divmod(args.requests, args.clients)
    counts = [base + (1 if i < rem else 0) for i in range(args.clients)]
    if args.requests < 1:
        raise SystemExit("--requests must be >= 1")

    def client(idx):
        mine = []
        for r in range(counts[idx]):
            h = histories[(idx * max(base, 1) + r) % len(histories)]
            t0 = time.perf_counter()
            post(h)
            mine.append((time.perf_counter() - t0) * 1e3)
        with lock:
            latencies.extend(mine)

    stats0 = service.stats
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    stats = service.stats
    served = stats["requests"] - stats0["requests"]
    batches = stats["batches"] - stats0["batches"]
    server.stop()

    lat = np.sort(np.asarray(latencies))
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "histories_per_sec": round(len(lat) / dt, 1),
        "p50_ms": round(float(lat[len(lat) // 2]), 2),
        "p99_ms": round(float(lat[int(len(lat) * 0.99)]), 2),
        "clients": args.clients,
        "batches": batches,
        "mean_batch_fill": round(served / max(batches, 1), 2),
        "capacity": args.capacity,
    }))


if __name__ == "__main__":
    main()
