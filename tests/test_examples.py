"""Smoke the offline example scripts end to end.

The examples are the de-facto user-facing API surface (SURVEY.md §1 row
10); running the network-free ones in subprocesses keeps them from
rotting as the API evolves. Dataset-download examples are exercised for
importability only.
"""

import importlib
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OFFLINE_EXAMPLES = [
    "examples.bert4rec_lifecycle_example",
    "examples.loss_calculation_example",
]

# network-dependent or long-running: importable, not executed
IMPORT_ONLY = [
    "examples.dataloader_usage_example",   # downloads real ML-1M
    "examples.bert4rec_ml_1m_example",
    "examples.bert4rec_ml_20m_example",
    "examples.bert4rec_beauty_example",
    "examples.bert4rec_steam_example",
    "examples.bert4rec_reddit_example",
    "examples.bert4rec_evaluation_example",
    "examples.bert4rec_save_and_load_example",
    "examples.recommender_app_example",
    "examples.ranker_app_example",
    "examples.multihost_example",
    "examples.sharded_ranking_example",
    "examples.temporal_features_example",
    "examples.sasrec_example",
    "examples.serving_export_example",
    "examples.serving_server_example",
]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
@pytest.mark.parametrize("module", OFFLINE_EXAMPLES)
def test_offline_example_runs(module):
    # force the CPU backend from INSIDE the process: the axon TPU plugin
    # ignores JAX_PLATFORMS, and example subprocesses must never claim the
    # real chip (serial-access discipline)
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            f"import runpy; runpy.run_module('{module}', "
            "run_name='__main__')")
    proc = subprocess.run(
        [sys.executable, "-c", code], env=_env(), cwd=REPO,
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, \
        f"{module} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-3000:]}"


@pytest.mark.parametrize("module", IMPORT_ONLY)
def test_example_imports(module):
    importlib.import_module(module)
