"""Exact metric math on hand-fed ranks (contract parity with reference
tests/evaluators_tests/evaluation_metrics_tests.py)."""

import numpy as np
import pytest

from bert4rec_tpu.evaluation import Counter, HR, MAP, NDCG


class TestMetrics:

    def test_counter(self):
        c = Counter("Valid Ranks")
        for r in [1, 5, 100]:
            c.update(r)
        assert c.result() == 3
        c.update_batch(np.array([2, 3]))
        assert c.result() == 5
        c.reset()
        assert c.result() == 0

    def test_hit_ratio(self):
        hr = HR(5)
        for r in [1, 5, 6, 100]:
            hr.update(r)
        assert hr.result() == 0.5
        assert hr.name == "HR@5"

    def test_hit_ratio_batch_equals_scalar(self):
        ranks = np.array([1, 2, 10, 11, 3, 7])
        a, b = HR(10), HR(10)
        for r in ranks:
            a.update(int(r))
        b.update_batch(ranks)
        assert a.result() == b.result()

    def test_ndcg(self):
        m = NDCG(10)
        m.update(1)
        np.testing.assert_allclose(m.result(), 1.0)
        m.update(3)  # 1/log2(4) = 0.5
        np.testing.assert_allclose(m.result(), (1.0 + 0.5) / 2)
        m.update(11)  # beyond k: contributes 0
        np.testing.assert_allclose(m.result(), 1.5 / 3)

    def test_ndcg_batch_equals_scalar(self):
        ranks = np.array([1, 2, 10, 11, 3, 7])
        a, b = NDCG(10), NDCG(10)
        for r in ranks:
            a.update(int(r))
        b.update_batch(ranks)
        np.testing.assert_allclose(a.result(), b.result())

    def test_map_is_mrr(self):
        m = MAP()
        m.update(1)
        m.update(4)
        np.testing.assert_allclose(m.result(), (1.0 + 0.25) / 2)

    def test_empty_results_are_zero(self):
        assert HR(10).result() == 0.0
        assert NDCG(10).result() == 0.0
        assert MAP().result() == 0.0
