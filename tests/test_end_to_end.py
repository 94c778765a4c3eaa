"""End-to-end learning tests the reference lacks (SURVEY.md §4
implications): the model must actually LEARN sequential structure, and the
full train+eval flow must hold together on a multi-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bert4rec_tpu.core.mesh import MeshConfig, create_mesh
from bert4rec_tpu.dataloaders.processed_dataset import MaskingConfig, ProcessedDataset
from bert4rec_tpu.dataloaders import samplers
from bert4rec_tpu.evaluation import BERT4RecEvaluator
from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel
from bert4rec_tpu.trainers import BERT4RecTrainer, optimizers

VOCAB = 43  # 40 items + 3 special
SEQ = 16


def markov_sequences(n, seed=0):
    """Deterministic cyclic transitions: item i is always followed by
    (i + 1) mod 40 — a pattern a working masked-LM must pick up."""
    rng = np.random.default_rng(seed)
    seqs = []
    for _ in range(n):
        start = int(rng.integers(0, 40))
        length = int(rng.integers(8, SEQ + 1))
        seqs.append(((np.arange(length) + start) % 40 + 3).astype(np.int32))
    return seqs


def make_ds(seqs, finetuning=False):
    cfg = MaskingConfig(max_seq_len=SEQ, max_predictions_per_seq=4,
                        mask_token_id=1, pad_token_id=0, unk_token_id=2,
                        masked_lm_rate=0.3)
    ft = np.full(len(seqs), finetuning)
    return ProcessedDataset(seqs, cfg, lambda: VOCAB, finetuning=ft)


def make_model(**kw):
    return BERT4RecModel(config=BERT4RecConfig(
        vocab_size=VOCAB, hidden_size=48, num_layers=2,
        num_attention_heads=4, inner_dim=96, max_sequence_length=SEQ,
        max_predictions_per_seq=4, output_dropout=0.1, **kw))


def make_sampler(seqs):
    source = [int(t) for s in seqs for t in s]
    return samplers.get("pop_random", source=source,
                        vocab=list(dict.fromkeys(source)),
                        sample_size=20, seed=0)


class TestLearning:

    def test_model_learns_structure_and_eval_improves(self):
        """Train on deterministic transitions; masked accuracy must become
        near-perfect and sampled-negative HR@1 must beat chance by a wide
        margin (chance HR@1 over 21 candidates ~ 0.05)."""
        train = make_ds(markov_sequences(512, seed=0))
        test_seqs = markov_sequences(64, seed=1)
        test = make_ds(test_seqs, finetuning=True)

        model = make_model()
        trainer = BERT4RecTrainer(model)
        trainer.initialize_model(
            optimizer=optimizers.create_adam_w_optimizer(
                init_lr=1e-2, num_train_steps=20000, num_warmup_steps=50),
            rng=jax.random.key(0))
        history = trainer.train(train, epochs=120, batch_size=64,
                                verbose=False)
        assert history.history["masked_accuracy"][-1] > 0.8, \
            history.history["masked_accuracy"][-5:]

        evaluator = BERT4RecEvaluator(sampler=make_sampler(test_seqs),
                                      sample_size=20)
        results = evaluator.evaluate(model, trainer.params, test,
                                     batch_size=32, progress_bar=False)
        assert results["HR@1"] > 0.8, results
        assert results["NDCG@10"] > 0.8, results


class TestShardedEndToEnd:

    def test_train_and_eval_on_mesh(self):
        """DP(4) x TP(2) mesh: train a few epochs, then run the sharded
        evaluator; results must match the single-device evaluator exactly
        (same params, same sampler seed)."""
        mesh = create_mesh(MeshConfig(model_parallelism=2))
        train = make_ds(markov_sequences(256, seed=0))
        test_seqs = markov_sequences(48, seed=1)

        # vocab 43 is not divisible by model_parallelism=2: pad the table
        model = make_model(vocab_pad_to=8)
        trainer = BERT4RecTrainer(model, mesh=mesh)
        trainer.initialize_model(
            optimizer=optimizers.create_adam_w_optimizer(
                init_lr=3e-3, num_train_steps=1000, num_warmup_steps=10),
            rng=jax.random.key(0))
        history = trainer.train(train, epochs=3, batch_size=64,
                                verbose=False)
        assert history.history["loss"][-1] < history.history["loss"][0]

        params_host = jax.device_get(trainer.state["params"])

        # batch_size=32 does not divide 48 -> exercises the padded final
        # batch on the mesh path. seed=7 pins the negative draws: an
        # unseeded evaluator pulls fresh OS entropy per run, so the
        # mesh-vs-single exactness comparison needs an explicit seed.
        ev_mesh = BERT4RecEvaluator(sampler=make_sampler(test_seqs),
                                    sample_size=20, mesh=mesh, seed=7)
        res_mesh = ev_mesh.evaluate(
            model, trainer.state["params"],
            make_ds(test_seqs, finetuning=True), batch_size=32,
            progress_bar=False, seed=7)

        ev_single = BERT4RecEvaluator(sampler=make_sampler(test_seqs),
                                      sample_size=20, seed=7)
        res_single = ev_single.evaluate(
            model, params_host, make_ds(test_seqs, finetuning=True),
            batch_size=32, progress_bar=False, seed=7)

        assert res_mesh["Valid Ranks"] == res_single["Valid Ranks"] == 48
        for k in res_single:
            np.testing.assert_allclose(res_mesh[k], res_single[k],
                                       rtol=1e-6, err_msg=k)


class TestRedditScaleSharded:

    def test_reddit_vocab_sharded_training(self):
        """The one reference workload that needs the vocab-sharded table:
        Reddit's 335,420-item vocab (+3 specials), reddit_128 encoder,
        8-way 'model'-axis sharding. Initial loss must be ~ln(V) — a
        uniform softmax over the true vocab — proving the padded,
        sharded tied softmax is numerically right at scale."""
        from jax.sharding import PartitionSpec as P

        vocab_size = 335423  # 335,420 items + [PAD]/[MASK]/[UNK]
        mesh = create_mesh(MeshConfig(model_parallelism=8))
        model = BERT4RecModel(config=BERT4RecConfig(
            vocab_size=vocab_size, hidden_size=128, num_layers=2,
            num_attention_heads=4, inner_dim=512, max_sequence_length=200,
            max_predictions_per_seq=40, vocab_pad_to=1024))
        trainer = BERT4RecTrainer(model, mesh=mesh)
        trainer.initialize_model(rng=jax.random.key(0))

        emb = trainer.state["params"]["encoder"]["item_embeddings"]["embedding"]
        assert emb.sharding.spec == P("model", None)
        assert trainer.state["params"]["mlm"]["output_bias"].sharding.spec \
            == P("model")

        rng = np.random.default_rng(0)
        seqs = [rng.integers(3, vocab_size,
                             size=int(rng.integers(20, 200))).astype(np.int32)
                for _ in range(32)]
        cfg = MaskingConfig(max_seq_len=200, max_predictions_per_seq=40,
                            mask_token_id=1, pad_token_id=0, unk_token_id=2,
                            masked_lm_rate=0.2)
        h = trainer.train(ProcessedDataset(seqs, cfg, lambda: vocab_size),
                          epochs=1, batch_size=16, verbose=False)
        assert abs(h.history["loss"][0] - np.log(vocab_size)) < 1.0

        # full-vocab top-k ranking on the sharded table (VERDICT r1 #5):
        # shard-local top-k + merge — never replicates [B, P, 335k]
        inputs = {
            "input_word_ids": jnp.asarray(
                np.stack([np.pad(s[:200], (0, max(0, 200 - len(s))))
                          for s in seqs[:2]]).astype(np.int32)),
            "input_mask": jnp.asarray(
                np.stack([(np.arange(200) < min(len(s), 200))
                          for s in seqs[:2]]).astype(np.int32)),
            "masked_lm_positions": jnp.asarray([[0, 1], [2, 3]], jnp.int32),
        }
        k = 10
        fn = jax.jit(lambda p, i: model.rank_top_k(p, i, k, mesh=mesh))
        ids, scores = fn(trainer.state["params"], inputs)
        assert ids.shape == (2, 2, k)
        # equal to the dense answer (dense path only lives in this test)
        logits = model.apply(trainer.state["params"], inputs)["mlm_logits"]
        dvals, dids = jax.lax.top_k(logits, k)
        np.testing.assert_allclose(np.asarray(scores), np.asarray(dvals),
                                   rtol=1e-5)
        assert np.all(np.asarray(ids) < vocab_size)  # pad ids never surface


class TestFusedKernelsOnMesh:

    def test_fused_stack_matches_xla_on_dp_mesh(self):
        """Pallas kernels under a DP mesh (GSPMD partitions around the
        opaque calls): losses must match the XLA path exactly (dropout off
        so the interpret-mode kernels are permitted on CPU)."""
        seqs = markov_sequences(64, seed=3)

        def run(fused):
            model = BERT4RecModel(config=BERT4RecConfig(
                vocab_size=VOCAB, hidden_size=32, num_layers=1,
                num_attention_heads=4, inner_dim=64, max_sequence_length=SEQ,
                max_predictions_per_seq=4, attention_dropout=0.0,
                output_dropout=0.0, use_fused_layer=fused,
                use_fused_loss=fused))
            mesh = create_mesh(MeshConfig(model_parallelism=1))
            trainer = BERT4RecTrainer(model, mesh=mesh)
            trainer.initialize_model(rng=jax.random.key(0))
            h = trainer.train(make_ds(seqs), epochs=1, batch_size=32,
                              verbose=False, seed=1)
            return h.history["loss"][0]

        np.testing.assert_allclose(run(False), run(True), rtol=1e-5)

    def test_sharded_fused_loss_matches_xla_on_tp_mesh(self):
        """use_fused_loss on a vocab-SHARDED table routes through the
        shard_map'd cross-shard kernels; training losses must match the
        GSPMD/XLA path exactly (dropout off for interpret kernels)."""
        seqs = markov_sequences(64, seed=4)

        def run(fused):
            model = BERT4RecModel(config=BERT4RecConfig(
                vocab_size=VOCAB, hidden_size=32, num_layers=1,
                num_attention_heads=4, inner_dim=64, max_sequence_length=SEQ,
                max_predictions_per_seq=4, attention_dropout=0.0,
                output_dropout=0.0, vocab_pad_to=8,
                use_fused_loss=fused))
            mesh = create_mesh(MeshConfig(model_parallelism=8))
            trainer = BERT4RecTrainer(model, mesh=mesh)
            trainer.initialize_model(rng=jax.random.key(0))
            emb = trainer.state["params"]["encoder"]["item_embeddings"][
                "embedding"]
            assert emb.sharding.spec == jax.sharding.PartitionSpec(
                "model", None)
            h = trainer.train(make_ds(seqs), epochs=2, batch_size=32,
                              verbose=False, seed=1)
            return h.history

        hx, hf = run(False), run(True)
        np.testing.assert_allclose(hx["loss"], hf["loss"], rtol=1e-5)
        np.testing.assert_allclose(hx["masked_accuracy"],
                                   hf["masked_accuracy"], rtol=1e-5)
