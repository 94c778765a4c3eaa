"""AOT serving export (models/export.py): artifacts must reproduce the
live model's outputs after a serialize->file->deserialize roundtrip, and a
symbolic-batch artifact must serve multiple batch sizes."""

import jax
import numpy as np
import pytest

from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel, export

VOCAB = 50
S, P, K, C = 12, 3, 5, 7


@pytest.fixture(scope="module")
def model_and_params():
    cfg = BERT4RecConfig(vocab_size=VOCAB, hidden_size=32, num_layers=2,
                         num_attention_heads=4, inner_dim=64,
                         max_sequence_length=S, max_predictions_per_seq=P)
    model = BERT4RecModel(config=cfg)
    params = model.init(jax.random.key(0))
    return model, params


def make_inputs(b, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, VOCAB, size=(b, S)).astype(np.int32)
    mask = np.ones((b, S), np.int32)
    mask[:, S - 2:] = 0
    pos = np.tile(np.arange(P, dtype=np.int32), (b, 1))
    return ids, mask, pos


class TestTopKExport:

    def test_roundtrip_matches_model(self, model_and_params, tmp_path):
        model, params = model_and_params
        art = export.export_top_k(model, params, K)
        path = tmp_path / "top_k.jaxexport"
        export.save_artifact(art, path)
        served = export.load_artifact(path)

        for b in (2, 5):  # symbolic batch: one artifact, several sizes
            ids, mask, pos = make_inputs(b, seed=b)
            got_ids, got_scores = served.call(ids, mask, pos)
            inputs = {"input_word_ids": ids, "input_mask": mask,
                      "masked_lm_positions": pos}
            want_ids, want_scores = model.rank_top_k(params, inputs, K)
            np.testing.assert_array_equal(np.asarray(got_ids),
                                          np.asarray(want_ids))
            np.testing.assert_allclose(np.asarray(got_scores),
                                       np.asarray(want_scores), rtol=1e-5)
            assert np.asarray(got_ids).shape == (b, P, K)

    def test_concrete_batch_rejects_other_sizes(self, model_and_params):
        model, params = model_and_params
        art = export.export_top_k(model, params, K, batch_size=2)
        ids, mask, pos = make_inputs(3)
        with pytest.raises(ValueError):
            art.call(ids, mask, pos)

    def test_weights_are_embedded(self, model_and_params, tmp_path):
        """The artifact is self-contained: its file is at least as large as
        the embedded table, and calling needs no params."""
        model, params = model_and_params
        path = tmp_path / "a.jaxexport"
        export.save_artifact(export.export_top_k(model, params, K), path)
        table_bytes = np.asarray(
            params["encoder"]["item_embeddings"]["embedding"]).nbytes
        assert path.stat().st_size > table_bytes


class TestArtifactRecommender:

    def test_matches_live_recommender_and_serves(self, model_and_params,
                                                 tmp_path):
        """Export with exclusion -> ArtifactRecommender equals the live
        Recommender.recommend_batch, incl. through RecommenderService."""
        from bert4rec_tpu.apps import (
            ArtifactRecommender, Recommender, RecommenderService,
        )
        from bert4rec_tpu.dataloaders import BERT4RecDataloader

        model, params = model_and_params
        dataloader = BERT4RecDataloader(max_seq_len=S,
                                        max_predictions_per_seq=P)
        vocab = [f"movie {i}" for i in range(VOCAB - 3)]
        dataloader.generate_vocab(vocab)

        art = export.export_top_k(model, params, K, num_exclude=16)
        path = tmp_path / "rec.jaxexport"
        export.save_artifact(art, path)
        served = ArtifactRecommender(export.load_artifact(path), dataloader)

        live = Recommender(model, params, dataloader)
        histories = [vocab[:4], vocab[4:9], vocab[9:11]]
        got = served.recommend_batch(histories, top_k=K)
        want = live.recommend_batch([list(h) for h in histories], top_k=K)
        assert got == want
        for h, recs in zip(histories, got):
            assert all(r not in h for r in recs)

        # drop-in backend for the serving service
        service = RecommenderService(served, max_k=K, batch_capacity=4,
                                     max_wait_ms=0)
        try:
            assert service.recommend(histories[0], k=K) == want[0]
            assert service.recommend(histories[1], k=2) == want[1][:2]
        finally:
            service.close()

    def test_requires_exclusion_input(self, model_and_params):
        from bert4rec_tpu.apps import ArtifactRecommender
        model, params = model_and_params
        art = export.export_top_k(model, params, K)  # no num_exclude
        with pytest.raises(ValueError, match="num_exclude"):
            ArtifactRecommender(art, dataloader=None)

    def test_service_validates_per_request_not_per_batch(
            self, model_and_params):
        """Requests an artifact backend cannot serve must fail their OWN
        caller at submit time — never poison a shared coalesced batch."""
        from bert4rec_tpu.apps import ArtifactRecommender, RecommenderService
        from bert4rec_tpu.dataloaders import BERT4RecDataloader
        model, params = model_and_params
        dataloader = BERT4RecDataloader(max_seq_len=S,
                                        max_predictions_per_seq=P)
        vocab = [f"movie {i}" for i in range(VOCAB - 3)]
        dataloader.generate_vocab(vocab)
        art = export.export_top_k(model, params, K, num_exclude=8)
        backend = ArtifactRecommender(art, dataloader)

        with pytest.raises(ValueError, match="exported"):
            RecommenderService(backend, max_k=K + 1)

        service = RecommenderService(backend, max_k=K, batch_capacity=4,
                                     max_wait_ms=0)
        try:
            with pytest.raises(ValueError, match="exclusion capacity"):
                service.submit(vocab[:7], k=1)   # 7 + 3 specials > 8
            # valid requests keep working after the rejected one
            assert len(service.recommend(vocab[:2], k=2)) == 2
        finally:
            service.close()

    def test_oversize_history_and_k_raise(self, model_and_params):
        from bert4rec_tpu.apps import ArtifactRecommender
        from bert4rec_tpu.dataloaders import BERT4RecDataloader
        model, params = model_and_params
        dataloader = BERT4RecDataloader(max_seq_len=S,
                                        max_predictions_per_seq=P)
        vocab = [f"movie {i}" for i in range(VOCAB - 3)]
        dataloader.generate_vocab(vocab)
        art = export.export_top_k(model, params, K, num_exclude=4)
        rec = ArtifactRecommender(art, dataloader)
        with pytest.raises(ValueError, match="exclusion width"):
            rec.recommend_batch([vocab[:6]])  # 6 seen + 3 specials > 4
        with pytest.raises(ValueError, match="exported k"):
            rec.recommend_batch([vocab[:1]], top_k=K + 1)


class TestScoreCandidatesExport:

    def test_roundtrip_matches_model(self, model_and_params, tmp_path):
        model, params = model_and_params
        art = export.export_score_candidates(model, params, C)
        path = tmp_path / "scores.jaxexport"
        export.save_artifact(art, path)
        served = export.load_artifact(path)

        b = 4
        ids, mask, pos = make_inputs(b, seed=9)
        cands = np.random.default_rng(1).integers(
            3, VOCAB, size=(b, P, C)).astype(np.int32)
        got = np.asarray(served.call(ids, mask, pos, cands))
        inputs = {"input_word_ids": ids, "input_mask": mask,
                  "masked_lm_positions": pos}
        # jit the live side too: the artifact is a jitted lowering, and XLA
        # fusion reassociates float math vs the eager op-by-op path
        want = np.asarray(jax.jit(model.score_candidates)(
            params, inputs, cands))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        assert got.shape == (b, P, C)
