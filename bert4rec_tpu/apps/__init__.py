"""Inference apps (reference ``bert4rec/apps``) + online serving runtime."""

from bert4rec_tpu.apps.recommender import ArtifactRecommender, Recommender
from bert4rec_tpu.apps.ranker import Ranker
from bert4rec_tpu.apps.serving import (
    MicroBatcher, RecommenderService, ServingServer,
)

__all__ = ["ArtifactRecommender", "Recommender", "Ranker", "MicroBatcher",
           "RecommenderService", "ServingServer"]
