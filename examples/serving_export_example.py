"""AOT serving export: compile the serving computation (weights embedded)
to one portable artifact file, then serve it WITHOUT the model code.

The reference's serving story is a Keras SavedModel reloaded into Python
(reference bert4rec/models/model_wrapper.py:24-74); the TPU-native
equivalent is a ``jax.export`` StableHLO artifact — the serving process
needs only jax, not bert4rec_tpu.
"""

import pathlib
import sys

import jax
import numpy as np

from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel, export


def main(artifact_path: str = "/tmp/bert4rec_topk.jaxexport"):
    # stand-in for a trained model: BERT4RecModelWrapper.load(...) in a
    # real flow (see bert4rec_save_and_load_example.py)
    cfg = BERT4RecConfig(vocab_size=3709, hidden_size=128, num_layers=2,
                         num_attention_heads=8, inner_dim=512,
                         max_sequence_length=200,
                         max_predictions_per_seq=40)
    model = BERT4RecModel(config=cfg)
    params = model.init(jax.random.key(0))

    # one artifact, any batch size (symbolic batch dim), top-10 ranking
    artifact = export.export_top_k(model, params, k=10)
    export.save_artifact(artifact, artifact_path)
    size_mb = pathlib.Path(artifact_path).stat().st_size / 1e6
    print(f"exported {artifact_path} ({size_mb:.1f} MB, "
          f"platforms={artifact.platforms})")

    # --- serving side: only jax + the artifact file -------------------- #
    served = export.load_artifact(artifact_path)
    for batch in (1, 4):
        ids = np.random.default_rng(0).integers(
            3, cfg.vocab_size, size=(batch, 200)).astype(np.int32)
        mask = np.ones((batch, 200), np.int32)
        positions = np.zeros((batch, 40), np.int32)
        top_ids, top_scores = served.call(ids, mask, positions)
        print(f"batch {batch}: top-10 ids {np.asarray(top_ids)[0, 0]}")

    # --- int8 weights-only quantized artifact: ~4x smaller ------------- #
    q_path = artifact_path.replace(".jaxexport", ".int8.jaxexport")
    export.save_artifact(
        export.export_top_k(model, params, k=10, quantize="int8"), q_path)
    q_mb = pathlib.Path(q_path).stat().st_size / 1e6
    print(f"int8 artifact {q_path} ({q_mb:.1f} MB vs {size_mb:.1f} MB fp32)")

    # --- recommendation serving from the artifact alone ---------------- #
    # export with an exclusion input (seen items / specials), then
    # apps.ArtifactRecommender serves recommend_batch without any model
    # code or weight files — and drops into RecommenderService/HTTP:
    #   art = export.export_top_k(model, params, k=10, num_exclude=256)
    #   rec = ArtifactRecommender(load_artifact(path), dataloader)
    #   rec.recommend_batch([["Toy Story (1995)", ...]])


if __name__ == "__main__":
    main(*sys.argv[1:])
