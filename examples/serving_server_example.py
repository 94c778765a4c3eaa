"""Online serving: a saved model behind micro-batched HTTP (no reference
counterpart — the reference serves one history per Python call,
reference apps/recommender.py:6-63).

Loads a saved artifact, starts the JSON API, and demonstrates a client
request:

    python examples/serving_server_example.py bert4rec_ml-1m_128 8080

POST /v1/recommend {"history": ["Toy Story (1995)", ...], "k": 5}
GET  /healthz                      -> batching stats

Concurrent requests are coalesced into fixed-capacity device batches
(one compiled top-k program serves all traffic; see
bert4rec_tpu/apps/serving.py).
"""

import pathlib
import sys

from bert4rec_tpu.apps import Recommender, RecommenderService, ServingServer
from bert4rec_tpu.dataloaders import get_dataloader_factory
from bert4rec_tpu.models import BERT4RecModelWrapper


def main(save_path: str = "bert4rec_ml-1m_128", port: int = 8080):
    wrapper, extras = BERT4RecModelWrapper.load(pathlib.Path(save_path))
    dataloader = get_dataloader_factory("bert4rec").create_ml_1m_dataloader(
        tokenizer=extras.get("tokenizer"))

    recommender = Recommender(wrapper.model, wrapper.params, dataloader)
    service = RecommenderService(recommender, max_k=10, batch_capacity=32,
                                 max_wait_ms=2.0)
    server = ServingServer(service, host="127.0.0.1", port=int(port)).start()
    print(f"serving on http://127.0.0.1:{server.port}/v1/recommend "
          f"(GET /healthz for stats); Ctrl-C to stop")
    try:
        import signal
        signal.pause()
    except (KeyboardInterrupt, AttributeError):
        pass
    finally:
        server.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
