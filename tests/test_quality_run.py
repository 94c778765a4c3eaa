"""Turnkey quality harness (tools/quality_run.py): the offline pieces —
argument surface, graceful no-data exit, and result-file schema. The full
--smoke path runs as a subprocess-free import (fast model) in CI via the
markov learning test; here we only exercise the harness plumbing."""

import importlib.util
import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent


def load_harness():
    spec = importlib.util.spec_from_file_location(
        "quality_run", REPO / "tools" / "quality_run.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestQualityRunHarness:

    def test_argparser_defaults_match_reference_hparams(self):
        qr = load_harness()
        args = qr.build_argparser().parse_args([])
        assert args.dataset == "ml_1m"
        assert args.config == "ml-1m_128"
        assert args.batch_size == 256
        # None = defer to each dataset's reference duplication factor
        # (ML-1M's own default is the reference example's 10)
        assert args.dup is None
        assert args.finetuning_split == 0.1
        assert args.epochs == 150

    def test_real_mode_exits_gracefully_without_data(self, tmp_path,
                                                     capsys):
        qr = load_harness()
        rc = qr.main(["--dataset", "ml_1m", "--out", str(tmp_path)])
        if rc == 0:  # data actually on disk: the run produced results
            assert (tmp_path / "eval_results.json").exists()
            return
        assert rc == 2
        out = capsys.readouterr().out
        assert "not on disk" in out

    def test_smoke_families(self, tmp_path):
        """Both model families run the tiny smoke end to end and beat the
        popularity floor (the harness asserts it internally)."""
        import pytest
        qr = load_harness()
        for family in ("bert4rec", "sasrec"):
            out = tmp_path / family
            rc = qr.main(["--smoke", "--smoke-family", family,
                          "--out", str(out)])
            assert rc == 0
            payload = json.loads((out / "eval_results.json").read_text())
            assert payload["results"]["HR@10"] > 0.5
            assert payload["results"]["HR@10"] > \
                payload["results_popularity_floor"]["HR@10"]
        with pytest.raises(SystemExit):
            qr.build_argparser().parse_args(["--smoke-family", "nope"])

    def test_emit_schema(self, tmp_path):
        qr = load_harness()
        path = qr.emit(tmp_path, {
            "dataset": "x", "results": {"HR@10": 0.5, "NDCG@10": 0.4}})
        payload = json.loads(path.read_text())
        assert payload["results"]["HR@10"] == 0.5


class TestOracleMode:

    def test_oracle_presets_and_flags(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "quality_run", "tools/quality_run.py")
        qr = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(qr)
        args = qr.build_argparser().parse_args(
            ["--oracle", "--oracle-scale", "ml1m"])
        assert args.oracle and args.oracle_scale == "ml1m"
        # every preset carries the generator + training knobs run_oracle
        # reads, and the ml1m preset matches the ml-1m_128 encoder shape
        for ps in qr._ORACLE_PRESETS.values():
            for key in ("n_items", "branching", "alpha", "zipf_s", "seq",
                        "max_pred", "mask_rate", "train_rows", "test_rows",
                        "min_len", "epochs", "batch_size", "lr",
                        "sample_size", "model"):
                assert key in ps, key
        ml1m = qr._ORACLE_PRESETS["ml1m"]
        assert ml1m["n_items"] == 3706 and ml1m["seq"] == 200
        assert ml1m["model"]["hidden_size"] == 128

    def test_full_ranking_and_int8_flags(self):
        """The unsampled-protocol and quantized-serving blocks are part
        of the harness surface (r5): flags parse, the reddit scale
        exists, and each preset's gates carry the expected knobs."""
        qr = load_harness()
        args = qr.build_argparser().parse_args(
            ["--oracle", "--oracle-scale", "reddit", "--full-ranking",
             "--int8"])
        assert args.oracle_scale == "reddit"
        assert args.full_ranking and args.int8
        reddit = qr._ORACLE_PRESETS["reddit"]
        assert reddit["n_items"] == 335420  # golden catalog size
        # the ml20m preset gates the unsampled protocol
        assert qr._ORACLE_PRESETS["ml20m"]["gates"]["full_ndcg10"] > 0
        # the sasrec family carries its measured preset overrides
        assert "reddit" in qr._SASREC_ORACLE_PRESET_OVERRIDES
        assert "reddit" in qr._SASREC_ORACLE_GATE_OVERRIDES

    def test_temporal_oracle_family_flags_and_gates(self):
        qr = load_harness()
        args = qr.build_argparser().parse_args(
            ["--oracle", "--oracle-family", "temporal",
             "--oracle-scale", "ml1m"])
        assert args.oracle_family == "temporal"
        # every oracle scale has a temporal gate entry with the knobs
        # run_oracle_temporal reads
        assert set(qr._TEMPORAL_ORACLE_GATES) == set(qr._ORACLE_PRESETS)
        for g in qr._TEMPORAL_ORACLE_GATES.values():
            for key in ("ndcg10", "hr1", "ablation_margin", "beat_blind"):
                assert key in g, key
