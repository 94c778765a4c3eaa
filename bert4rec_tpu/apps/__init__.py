"""Inference apps (reference ``bert4rec/apps``)."""

from bert4rec_tpu.apps.recommender import Recommender
from bert4rec_tpu.apps.ranker import Ranker

__all__ = ["Recommender", "Ranker"]
