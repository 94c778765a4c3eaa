"""Device-side Gumbel top-k negative sampling (VERDICT r1 #3): exclusion
law, support, no-replacement, and distribution equality against the host
PopularRandomSampler oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from bert4rec_tpu.dataloaders.samplers import PopularRandomSampler
from bert4rec_tpu.ops.negative_sampling import popularity_logp, sample_negatives

V = 24
K = 6


def make_probs(seed=0):
    rng = np.random.default_rng(seed)
    counts = rng.integers(1, 50, size=V).astype(np.float64)
    counts[5] = 0  # a zero-mass item
    return counts / counts.sum()


class TestSampleNegatives:

    def test_shapes_exclusion_and_no_replacement(self):
        probs = make_probs()
        logp = popularity_logp(probs)
        without = jnp.asarray(
            np.broadcast_to(np.array([0, 1, 2, V, V, V, V, V], np.int32),
                            (4, 3, 8)).copy())
        idx = sample_negatives(jax.random.key(0), logp, without, K)
        got = np.asarray(idx)
        assert got.shape == (4, 3, K)
        assert got.min() >= 0 and got.max() < V
        for row in got.reshape(-1, K):
            assert len(set(row.tolist())) == K          # no replacement
            assert {0, 1, 2, 5}.isdisjoint(row.tolist())  # excl + zero-mass

    def test_per_row_exclusions_differ(self):
        probs = make_probs()
        logp = popularity_logp(probs)
        without = np.full((2, 1, 8), V, np.int32)
        without[0, 0, :3] = [10, 11, 12]
        without[1, 0, :3] = [20, 21, 22]
        got = np.asarray(sample_negatives(jax.random.key(1), logp,
                                          jnp.asarray(without), K))
        assert {10, 11, 12}.isdisjoint(got[0, 0].tolist())
        assert {20, 21, 22}.isdisjoint(got[1, 0].tolist())

    def test_distribution_matches_host_sampler(self):
        """Marginal inclusion frequencies of the device path must match the
        host Gumbel-top-k oracle (same distribution, different streams)."""
        probs = make_probs(3)
        logp = popularity_logp(probs)
        n_rows = 4000
        without = jnp.full((n_rows, 4), V, jnp.int32)  # no exclusions
        dev = np.asarray(sample_negatives(jax.random.key(2), logp,
                                          without, K))
        dev_freq = np.bincount(dev.ravel(), minlength=V) / (n_rows * K)

        sampler = PopularRandomSampler(
            source=None, vocab=list(range(V)), sample_size=K, seed=0)
        sampler._probs = probs
        sampler._vocab_index = {i: i for i in range(V)}
        host = sampler.sample_batch([np.empty(0, np.int64)] * n_rows,
                                    sample_size=K, seed=1)
        host_freq = np.bincount(np.asarray(host).ravel(),
                                minlength=V) / (n_rows * K)

        np.testing.assert_allclose(dev_freq, host_freq, atol=0.012)
        assert dev_freq[5] == host_freq[5] == 0.0  # zero-mass item


class TestEvaluatorPathEquivalence:

    def test_device_and_host_eval_agree_statistically(self):
        """Full evaluator runs with device vs host negatives on the same
        model/data: metrics agree within sampling noise."""
        from bert4rec_tpu.dataloaders.processed_dataset import (
            MaskingConfig, ProcessedDataset,
        )
        from bert4rec_tpu.evaluation import BERT4RecEvaluator
        from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
        from bert4rec_tpu.dataloaders import samplers

        vocab = 43
        rng = np.random.default_rng(0)
        seqs = [((np.arange(int(rng.integers(8, 16))) + int(
            rng.integers(0, 40))) % 40 + 3).astype(np.int32)
            for _ in range(96)]
        cfg = MaskingConfig(max_seq_len=16, max_predictions_per_seq=4,
                            mask_token_id=1, pad_token_id=0, unk_token_id=2)
        ds = ProcessedDataset(seqs, cfg, lambda: vocab,
                              finetuning=np.ones(len(seqs), bool))
        model = BERT4RecModel(config=BERT4RecConfig(
            vocab_size=vocab, hidden_size=32, num_layers=1,
            num_attention_heads=4, inner_dim=64, max_sequence_length=16,
            max_predictions_per_seq=4))
        params = model.init(jax.random.key(0))

        source = [int(t) for s in seqs for t in s]
        def sampler():
            return samplers.get("pop_random", source=source,
                                vocab=list(dict.fromkeys(source)),
                                sample_size=20, seed=0)

        ev_dev = BERT4RecEvaluator(sampler=sampler(), sample_size=20,
                                   device_negatives=True)
        res_dev = ev_dev.evaluate(model, params, ds, batch_size=32,
                                  progress_bar=False)
        ev_host = BERT4RecEvaluator(sampler=sampler(), sample_size=20,
                                    device_negatives=False)
        res_host = ev_host.evaluate(model, params, ds, batch_size=32,
                                    progress_bar=False)

        assert res_dev["Valid Ranks"] == res_host["Valid Ranks"] == 96
        for k in res_dev:
            if k == "Valid Ranks":
                continue
            assert abs(res_dev[k] - res_host[k]) < 0.25, (k, res_dev,
                                                          res_host)

    def _tiny_setup(self):
        from bert4rec_tpu.dataloaders.processed_dataset import (
            MaskingConfig, ProcessedDataset,
        )
        from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
        from bert4rec_tpu.dataloaders import samplers

        vocab = 43
        rng = np.random.default_rng(1)
        seqs = [((np.arange(int(rng.integers(8, 16))) + int(
            rng.integers(0, 40))) % 40 + 3).astype(np.int32)
            for _ in range(32)]
        cfg = MaskingConfig(max_seq_len=16, max_predictions_per_seq=4,
                            mask_token_id=1, pad_token_id=0, unk_token_id=2)
        ds = ProcessedDataset(seqs, cfg, lambda: vocab,
                              finetuning=np.ones(len(seqs), bool))
        model = BERT4RecModel(config=BERT4RecConfig(
            vocab_size=vocab, hidden_size=32, num_layers=1,
            num_attention_heads=4, inner_dim=64, max_sequence_length=16,
            max_predictions_per_seq=4))
        params = model.init(jax.random.key(0))
        source = [int(t) for s in seqs for t in s]
        sampler = samplers.get("pop_random", source=source,
                               vocab=list(dict.fromkeys(source)),
                               sample_size=8, seed=0)
        return ds, model, params, sampler

    def test_unseeded_evaluator_draws_fresh_negatives_per_run(self):
        """seed=None must not pin the device PRNG: two evaluate() calls on
        the same instance draw different negative sets (host-oracle
        default_rng(None) parity)."""
        from bert4rec_tpu.evaluation import BERT4RecEvaluator
        ds, model, params, sampler = self._tiny_setup()
        ev = BERT4RecEvaluator(sampler=sampler, sample_size=8,
                               device_negatives=True)
        assert ev.seed is None
        ev.evaluate(model, params, ds, batch_size=32, progress_bar=False)
        key1 = np.asarray(jax.random.key_data(ev._base_key)).copy()
        ev.evaluate(model, params, ds, batch_size=32, progress_bar=False)
        key2 = np.asarray(jax.random.key_data(ev._base_key))
        assert not np.array_equal(key1, key2)

        # seeded instances stay deterministic across runs (metrics holders
        # accumulate across evaluate() calls — reference parity — so reset
        # between the two measurement runs)
        ev_s = BERT4RecEvaluator(sampler=sampler, sample_size=8, seed=7,
                                 device_negatives=True)
        a = ev_s.evaluate(model, params, ds, batch_size=32,
                          progress_bar=False)
        ev_s.reset_metrics()
        b = ev_s.evaluate(model, params, ds, batch_size=32,
                          progress_bar=False)
        assert a == b

    def test_device_negatives_scores_mesh_free_models(self):
        """A duck-typed model whose score_candidates lacks a mesh parameter
        must work on the fused path under a mesh (the host path guards the
        same contract)."""
        from bert4rec_tpu.core.mesh import MeshConfig, create_mesh
        from bert4rec_tpu.evaluation import BERT4RecEvaluator
        ds, model, params, sampler = self._tiny_setup()

        class MeshFree:
            config = model.config

            def score_candidates(self, params, batch, candidates):
                return model.score_candidates(params, batch, candidates)

        mesh = create_mesh(MeshConfig())
        ev = BERT4RecEvaluator(sampler=sampler, sample_size=8, seed=0,
                               device_negatives=True, mesh=mesh)
        res = ev.evaluate(MeshFree(), params, ds, batch_size=32,
                          progress_bar=False)
        assert res["Valid Ranks"] == 32

    def test_explicit_device_negatives_true_raises_when_unavailable(self):
        """device_negatives=True with a sampler that cannot run on device
        must raise, not silently fall back to the host path."""
        import pytest
        from bert4rec_tpu.dataloaders.samplers import RandomSampler
        from bert4rec_tpu.evaluation import BERT4RecEvaluator
        ds, model, params, _ = self._tiny_setup()

        # RandomSampler has no popularity distribution => no device path
        uniform = RandomSampler(vocab=list(range(43)), sample_size=8, seed=0)
        ev = BERT4RecEvaluator(sampler=uniform, sample_size=8,
                               device_negatives=True)
        with pytest.raises(ValueError, match="device_negatives=True"):
            ev.evaluate(model, params, ds, batch_size=32,
                        progress_bar=False)
