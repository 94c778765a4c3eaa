"""SASRec model family tests (BEYOND PARITY — no reference counterpart).

Covers the three pieces the family is built from: the vectorized
``next_item_features`` law, the ``task="next_item"`` ProcessedDataset /
SASRecPreprocessor plumbing, and the causal-attention encoder mode — plus
an end-to-end learning test (causal model must pick up deterministic
transitions) and evaluator integration on the leave-one-out protocol."""

import jax
import numpy as np
import pytest

from bert4rec_tpu.dataloaders import dataloader_utils as utils
from bert4rec_tpu.dataloaders import samplers
from bert4rec_tpu.dataloaders.preprocessors import SASRecPreprocessor, get as get_pre
from bert4rec_tpu.dataloaders.processed_dataset import MaskingConfig, ProcessedDataset
from bert4rec_tpu.evaluation import BERT4RecEvaluator
from bert4rec_tpu.models import BERT4RecConfig, BERT4RecModel, SASRecModel
from bert4rec_tpu.models.components.networks import Bert4RecEncoder
from bert4rec_tpu.trainers import BERT4RecTrainer, optimizers

VOCAB = 43  # 40 items + 3 special
SEQ = 16


def mk_cfg(**kw):
    return MaskingConfig(max_seq_len=SEQ, max_predictions_per_seq=4,
                         mask_token_id=1, pad_token_id=0, unk_token_id=2, **kw)


def pad_rows(rows, s=SEQ):
    ids = np.zeros((len(rows), s), np.int32)
    for i, r in enumerate(rows):
        ids[i, :len(r)] = r
    return ids, np.array([len(r) for r in rows], np.int32)


class TestNextItemFeatures:

    def test_basic_law(self):
        """Every position < len-1 predicts its successor; the final item is
        dropped from the input."""
        ids, lengths = pad_rows([[10, 11, 12, 13, 14]])
        f = utils.next_item_features(ids, lengths, 4, pad_token_id=0)
        np.testing.assert_array_equal(
            f["input_word_ids"][0, :5], [10, 11, 12, 13, 0])
        np.testing.assert_array_equal(f["masked_lm_positions"][0], [0, 1, 2, 3])
        np.testing.assert_array_equal(f["masked_lm_ids"][0], [11, 12, 13, 14])
        np.testing.assert_array_equal(f["masked_lm_weights"][0], [1, 1, 1, 1])

    def test_keeps_last_positions_when_over_budget(self):
        """len-1 > P: the LAST P predictable positions survive (nearest to
        the inference regime)."""
        ids, lengths = pad_rows([[10, 11, 12, 13, 14, 15, 16]])
        f = utils.next_item_features(ids, lengths, 4, pad_token_id=0)
        np.testing.assert_array_equal(f["masked_lm_positions"][0], [2, 3, 4, 5])
        np.testing.assert_array_equal(f["masked_lm_ids"][0], [13, 14, 15, 16])
        assert f["masked_lm_weights"][0].sum() == 4

    def test_finetuning_predicts_only_held_out_item(self):
        ids, lengths = pad_rows([[10, 11, 12, 13, 14]])
        f = utils.next_item_features(ids, lengths, 4, pad_token_id=0,
                                     finetuning=np.array([True]))
        assert f["masked_lm_weights"][0].sum() == 1
        assert f["masked_lm_positions"][0, 0] == 3
        assert f["masked_lm_ids"][0, 0] == 14
        assert f["input_word_ids"][0, 4] == 0

    def test_short_and_empty_rows(self):
        ids, lengths = pad_rows([[7], [], [8, 9]])
        f = utils.next_item_features(ids, lengths, 4, pad_token_id=0)
        assert f["masked_lm_weights"][0].sum() == 0   # nothing to predict
        assert f["masked_lm_weights"][1].sum() == 0
        assert f["masked_lm_weights"][2].sum() == 1
        assert f["input_word_ids"][0, 0] == 0         # single item dropped
        np.testing.assert_array_equal(f["input_word_ids"][2, :2], [8, 0])
        assert f["masked_lm_ids"][2, 0] == 9

    def test_invalid_slots_are_zeroed(self):
        ids, lengths = pad_rows([[5, 6]])
        f = utils.next_item_features(ids, lengths, 4, pad_token_id=0)
        np.testing.assert_array_equal(f["masked_lm_ids"][0, 1:], 0)
        np.testing.assert_array_equal(f["masked_lm_positions"][0, 1:], 0)


class TestNextItemDataset:

    def test_materialize_contract(self):
        seqs = [np.arange(3, 3 + n, dtype=np.int32) for n in (5, 9, 2)]
        ds = ProcessedDataset(seqs, mk_cfg(), lambda: VOCAB,
                              finetuning=np.zeros(3, bool), task="next_item")
        f = ds.materialize(seed=0)
        for key in ("labels", "input_word_ids", "input_mask",
                    "masked_lm_positions", "masked_lm_ids",
                    "masked_lm_weights"):
            assert key in f, key
        # labels keep the full sequence; input drops the final item
        np.testing.assert_array_equal(f["labels"][0, :5], seqs[0])
        assert f["input_word_ids"][0, 4] == 0
        # input_mask shrinks with the dropped item
        np.testing.assert_array_equal(f["input_mask"][0, :5], [1, 1, 1, 1, 0])
        # deterministic: no dynamic masking RNG in this task
        f2 = ds.materialize(seed=123)
        for k in f:
            np.testing.assert_array_equal(f[k], f2[k])

    def test_task_survives_subset_and_concat(self):
        seqs = [np.arange(3, 9, dtype=np.int32)] * 4
        ds = ProcessedDataset(seqs, mk_cfg(), lambda: VOCAB,
                              finetuning=np.zeros(4, bool), task="next_item")
        assert ds.select([0, 2]).task == "next_item"
        assert ds.concatenate(ds.select([1])).task == "next_item"
        assert ds.shard_for_process(0, 2).task == "next_item"

    def test_unknown_task_rejected(self):
        with pytest.raises(ValueError, match="Unknown task"):
            ProcessedDataset([np.arange(3, 6)], mk_cfg(), lambda: VOCAB,
                             task="causal_lm")


class TestSASRecPreprocessor:

    def _pre(self):
        from bert4rec_tpu import tokenizers
        tok = tokenizers.get("simple")
        tok.tokenize(["[PAD]", "[MASK]", "[UNK]"])  # ids 0,1,2
        pre = SASRecPreprocessor()
        pre.set_properties(tokenizer=tok, max_seq_len=SEQ,
                           max_predictions_per_seq=4, mask_token_id=1,
                           unk_token_id=2, pad_token_id=0)
        return pre, tok

    def test_factory_and_task(self):
        assert get_pre("sasrec").__class__ is SASRecPreprocessor
        assert SASRecPreprocessor._TASK == "next_item"

    def test_process_dataset_runs_next_item(self):
        pre, tok = self._pre()
        ds = pre.process_dataset([["a", "b", "c", "d"]], apply_mlm=True,
                                 finetuning=False)
        assert ds.task == "next_item"
        f = ds.materialize(0)
        # 4 items -> 3 predictions, final item dropped from input
        assert f["masked_lm_weights"][0].sum() == 3
        assert f["input_mask"][0].sum() == 3

    def test_prepare_inference_slot_at_last_history_position(self):
        """The appended placeholder becomes the dropped 'final item',
        leaving the prediction slot at the last real history position."""
        pre, tok = self._pre()
        tok.tokenize(["a", "b", "c"])
        f = pre.prepare_inference(["a", "b", "c"])
        assert f["masked_lm_weights"][0].sum() == 1
        # history of 3 + placeholder = length 4; slot at position 2
        assert f["masked_lm_positions"][0, 0] == 2
        assert f["input_mask"].sum() == 3


def causal_model(**kw):
    return SASRecModel(config=BERT4RecConfig(
        vocab_size=VOCAB, hidden_size=48, num_layers=2,
        num_attention_heads=4, inner_dim=96, max_sequence_length=SEQ,
        max_predictions_per_seq=4, **kw))


class TestSASRecModel:

    def test_config_autoflip_and_encoder_validation(self):
        m = causal_model()
        assert m.config.causal_attention
        bi = Bert4RecEncoder(BERT4RecConfig(
            vocab_size=VOCAB, hidden_size=32, num_layers=1,
            num_attention_heads=4, inner_dim=64, max_sequence_length=SEQ))
        with pytest.raises(ValueError, match="causal"):
            SASRecModel(encoder=bi)
        with pytest.raises(ValueError, match="encoder or a config"):
            SASRecModel()

    def test_causality_future_independence(self):
        """sequence_output[:, :i] must not change when inputs at >= i do."""
        model = causal_model()
        params = model.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        ids = rng.integers(3, VOCAB, size=(2, SEQ)).astype(np.int32)
        batch = {"input_word_ids": ids,
                 "input_mask": np.ones((2, SEQ), np.int32)}
        out1 = model.apply(params, batch)["sequence_output"]
        ids2 = ids.copy()
        ids2[:, 10:] = (ids2[:, 10:] + 7 - 3) % 40 + 3
        out2 = model.apply(params, {**batch, "input_word_ids": ids2}
                           )["sequence_output"]
        np.testing.assert_allclose(out1[:, :10], out2[:, :10],
                                   atol=1e-5, rtol=1e-5)
        assert np.abs(np.asarray(out1[:, 10:] - out2[:, 10:])).max() > 1e-3

    def test_bidirectional_model_is_not_causal(self):
        """Sanity check the causality test has teeth."""
        model = BERT4RecModel(config=BERT4RecConfig(
            vocab_size=VOCAB, hidden_size=48, num_layers=2,
            num_attention_heads=4, inner_dim=96, max_sequence_length=SEQ,
            max_predictions_per_seq=4))
        params = model.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        ids = rng.integers(3, VOCAB, size=(2, SEQ)).astype(np.int32)
        batch = {"input_word_ids": ids,
                 "input_mask": np.ones((2, SEQ), np.int32)}
        out1 = model.apply(params, batch)["sequence_output"]
        ids2 = ids.copy()
        ids2[:, 10:] = (ids2[:, 10:] + 7 - 3) % 40 + 3
        out2 = model.apply(params, {**batch, "input_word_ids": ids2}
                           )["sequence_output"]
        assert np.abs(np.asarray(out1[:, :10] - out2[:, :10])).max() > 1e-3

    @pytest.mark.parametrize("kernel_cfg,tol", [
        (dict(use_flash_attention=True), dict(rtol=2e-4, atol=2e-4)),
        # fused layer uses tanh-approximate gelu -> small systematic diff
        (dict(use_fused_layer=True), dict(rtol=2e-2, atol=5e-3)),
    ])
    def test_causal_kernel_paths_match_xla(self, kernel_cfg, tol):
        """The flash/fused kernels build the causal triangle in VMEM; their
        output must match the plain XLA attention path (interpret mode on
        CPU)."""
        plain = causal_model()
        fast = SASRecModel(config=plain.config.replace(**kernel_cfg))
        params = plain.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        ids = rng.integers(3, VOCAB, size=(2, SEQ)).astype(np.int32)
        lengths = np.array([SEQ, SEQ - 5])
        batch = {"input_word_ids": ids,
                 "input_mask": (np.arange(SEQ)[None, :]
                                < lengths[:, None]).astype(np.int32)}
        out_ref = plain.apply(params, batch)["sequence_output"]
        out_fast = fast.apply(params, batch)["sequence_output"]
        np.testing.assert_allclose(np.asarray(out_fast),
                                   np.asarray(out_ref), **tol)
        # and the fast path is still causal: future-token independence
        ids2 = ids.copy()
        ids2[:, 10:] = (ids2[:, 10:] + 7 - 3) % 40 + 3
        out_fast2 = fast.apply(params, {**batch, "input_word_ids": ids2}
                               )["sequence_output"]
        np.testing.assert_allclose(np.asarray(out_fast[:, :10]),
                                   np.asarray(out_fast2[:, :10]),
                                   rtol=1e-5, atol=1e-5)

    def test_causal_flag_roundtrips_through_wrapper(self, tmp_path):
        from bert4rec_tpu.models import BERT4RecModelWrapper
        model = causal_model()
        params = model.init(jax.random.key(0))
        wrapper = BERT4RecModelWrapper(model, params)
        wrapper.save(str(tmp_path / "m"))
        loaded, _extras = BERT4RecModelWrapper.load(str(tmp_path / "m"))
        assert loaded.model.config.causal_attention


def markov_sequences(n, seed=0):
    rng = np.random.default_rng(seed)
    seqs = []
    for _ in range(n):
        start = int(rng.integers(0, 40))
        length = int(rng.integers(8, SEQ + 1))
        seqs.append(((np.arange(length) + start) % 40 + 3).astype(np.int32))
    return seqs


class TestSASRecLearning:

    def test_learns_transitions_and_eval_improves(self):
        """Deterministic cyclic transitions: a working causal next-item
        model must reach near-perfect accuracy, and the 101-candidate-style
        evaluator must agree (chance HR@1 over 21 candidates ~ 0.05)."""
        train = ProcessedDataset(
            markov_sequences(512, seed=0), mk_cfg(), lambda: VOCAB,
            finetuning=np.zeros(512, bool), task="next_item")
        test_seqs = markov_sequences(64, seed=1)
        test = ProcessedDataset(
            test_seqs, mk_cfg(), lambda: VOCAB,
            finetuning=np.ones(64, bool), task="next_item")

        model = causal_model(output_dropout=0.1)
        trainer = BERT4RecTrainer(model)
        trainer.initialize_model(
            optimizer=optimizers.create_adam_w_optimizer(
                init_lr=1e-2, num_train_steps=20000, num_warmup_steps=50),
            rng=jax.random.key(0))
        history = trainer.train(train, epochs=60, batch_size=64,
                                verbose=False)
        assert history.history["masked_accuracy"][-1] > 0.8, \
            history.history["masked_accuracy"][-5:]

        source = [int(t) for s in test_seqs for t in s]
        sampler = samplers.get("pop_random", source=source,
                               vocab=list(dict.fromkeys(source)),
                               sample_size=20, seed=0)
        evaluator = BERT4RecEvaluator(sampler=sampler, sample_size=20)
        results = evaluator.evaluate(model, trainer.params, test,
                                     batch_size=32, progress_bar=False)
        assert results["HR@1"] > 0.8, results
        assert results["NDCG@10"] > 0.8, results
