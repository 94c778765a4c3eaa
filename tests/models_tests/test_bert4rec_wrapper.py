"""Save/load round trip tests (contract parity with reference
tests/models_tests/bert4rec_wrapper_tests.py:62-161)."""

import json

import jax
import numpy as np
import pytest

from bert4rec_tpu import tokenizers
from bert4rec_tpu.models import (
    BERT4RecConfig, BERT4RecModel, BERT4RecModelWrapper,
)
from bert4rec_tpu.models import bert4rec_wrapper as wrapper_mod


def make_model():
    cfg = BERT4RecConfig(vocab_size=40, hidden_size=16, num_layers=2,
                         num_attention_heads=2, inner_dim=32,
                         max_sequence_length=10, max_predictions_per_seq=2)
    return BERT4RecModel(config=cfg)


def make_tokenizer():
    tok = tokenizers.get("simple")
    for w in ["[PAD]", "[MASK]", "[UNK]", "itemA", "itemB", "itemC"]:
        tok.tokenize(w)
    return tok


class TestWrapper:

    def test_save_without_params_raises(self, tmp_path):
        wrapper = BERT4RecModelWrapper(make_model())
        with pytest.raises(RuntimeError):
            wrapper.save(tmp_path / "m", mode=2)

    def test_save_artifact_layout(self, tmp_path):
        model = make_model()
        params = model.init(jax.random.key(0))
        wrapper = BERT4RecModelWrapper(model, params)
        out = wrapper.save(tmp_path / "m", tokenizer=make_tokenizer(), mode=2)
        assert (out / wrapper_mod.WEIGHTS_FILE).is_file()
        assert (out / wrapper_mod.ENCODER_CONFIG_FILE).is_file()
        assert (out / wrapper_mod.META_CONFIG_FILE).is_file()
        assert (out / wrapper_mod.VOCAB_FILE).is_file()
        with open(out / wrapper_mod.META_CONFIG_FILE) as f:
            meta = json.load(f)
        assert meta["model"] == "BERT4RecModel"
        assert meta["tokenizer"] == "simple"

    def test_save_load_roundtrip(self, tmp_path):
        model = make_model()
        params = model.init(jax.random.key(0))
        tok = make_tokenizer()
        wrapper = BERT4RecModelWrapper(model, params)
        wrapper.save(tmp_path / "m", tokenizer=tok, mode=2)

        restored, extras = BERT4RecModelWrapper.load(tmp_path / "m", mode=2)
        assert isinstance(restored.model, BERT4RecModel)
        assert restored.model.config == model.config
        for a, b in zip(jax.tree.leaves(params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # tokenizer restored with identical vocab
        assert "tokenizer" in extras
        assert extras["tokenizer"].get_vocab() == tok.get_vocab()

        # restored model produces identical outputs
        rng = np.random.default_rng(0)
        batch = {
            "input_word_ids": rng.integers(3, 40, size=(2, 10)).astype(np.int32),
            "input_mask": np.ones((2, 10), np.int32),
            "masked_lm_positions": np.array([[1, 3], [0, 2]], np.int32),
        }
        out1 = model.apply(params, batch)
        out2 = restored.model.apply(restored.params, batch)
        np.testing.assert_array_equal(np.asarray(out1["mlm_logits"]),
                                      np.asarray(out2["mlm_logits"]))

    def test_load_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            BERT4RecModelWrapper.load(tmp_path / "nope", mode=2)

    def test_meta_update_and_delete(self):
        wrapper = BERT4RecModelWrapper(make_model())
        wrapper.update_meta({"custom": 1})
        assert wrapper.get_meta()["custom"] == 1
        wrapper.delete_keys_from_meta("custom")
        assert "custom" not in wrapper.get_meta()


class TestShippedConfigs:

    def test_all_13_configs_load(self):
        from bert4rec_tpu import config as config_pkg
        names = config_pkg.list_train_configs()
        assert len(names) == 13
        for name in names:
            cfg = config_pkg.load_train_config(name, vocab_size=100)
            assert cfg.num_layers == 2
            assert cfg.hidden_size in (64, 128, 256)
            assert cfg.max_sequence_length in (50, 200)

    def test_unknown_config_raises(self):
        from bert4rec_tpu import config as config_pkg
        with pytest.raises(FileNotFoundError):
            config_pkg.load_train_config("nope", vocab_size=10)


class TestShardedWrapperSave:

    def test_save_from_sharded_params_and_reload(self, tmp_path):
        """Saving a wrapper whose params live sharded on a mesh must produce
        the same artifact as host params, and reload to identical values."""
        from bert4rec_tpu.core.mesh import MeshConfig, create_mesh
        from bert4rec_tpu.core.partitioning import param_shardings

        cfg = BERT4RecConfig(vocab_size=40, hidden_size=16, num_layers=1,
                             num_attention_heads=2, inner_dim=32,
                             max_sequence_length=10,
                             max_predictions_per_seq=2, vocab_pad_to=8)
        model = BERT4RecModel(config=cfg)
        params = model.init(jax.random.key(7))
        mesh = create_mesh(MeshConfig(model_parallelism=8))
        sharded = jax.device_put(params, param_shardings(mesh, params))
        emb = sharded["encoder"]["item_embeddings"]["embedding"]
        assert emb.sharding.spec == jax.sharding.PartitionSpec("model", None)

        tok = make_tokenizer()
        BERT4RecModelWrapper(model, sharded).save(tmp_path / "m",
                                                  tokenizer=tok, mode=2)
        restored, _ = BERT4RecModelWrapper.load(tmp_path / "m", mode=2)
        for a, b in zip(jax.tree.leaves(params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
