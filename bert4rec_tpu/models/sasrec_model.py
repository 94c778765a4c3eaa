"""SASRec: causal next-item recommendation (BEYOND PARITY).

A second model family on the shared stack (the reference repo ships only
BERT4Rec): SASRec (Kang & McAuley, "Self-Attentive Sequential
Recommendation", ICDM 2018) trains a LEFT-TO-RIGHT transformer to predict
each item from its predecessors — no [MASK] token ever enters the input,
closing the train/inference gap BERT4Rec papers discuss.

Design: SASRec here is the same encoder/head/params/trainer/evaluator
machinery with two switches —

- ``config.causal_attention=True``: position i attends only to j <= i
  (bert4rec_encoder.py builds the additive causal bias);
- the ``"next_item"`` dataset task (dataloaders/processed_dataset.py): the
  final item is dropped from the input and every remaining position
  predicts its successor, emitted in the exact ``masked_lm_*`` feature
  contract — so the fused tied-softmax loss kernels, the sharded-table
  paths and the 101-candidate evaluator run unchanged.

Divergence from the paper (documented, deliberate): scoring keeps the
BERT-style transform head (dense+gelu+LN then tied-table matmul) instead
of the paper's raw dot product — a strict superset that shares the MLM
head kernels; and the optimizer defaults stay the framework's AdamW chain.
"""

from typing import Optional, Sequence

from bert4rec_tpu.core.dtypes import DTypePolicy
from bert4rec_tpu.models.bert4rec_model import (
    BERT4RecModel,
    SPECIAL_TOKEN_IDS,
)
from bert4rec_tpu.models.components.networks import Bert4RecEncoder
from bert4rec_tpu.models.config import BERT4RecConfig


class SASRecModel(BERT4RecModel):
    """BERT4RecModel with causal attention enforced.

    Pair it with ``SASRecPreprocessor`` (or any ``ProcessedDataset`` built
    with ``task="next_item"``); everything else — trainer, evaluator,
    wrapper persistence, ranking, serving apps — is inherited.
    """

    def __init__(self,
                 encoder: Bert4RecEncoder = None,
                 config: BERT4RecConfig = None,
                 special_token_ids: Sequence[int] = tuple(SPECIAL_TOKEN_IDS),
                 dtype_policy: Optional[DTypePolicy] = None):
        if encoder is None:
            if config is None:
                raise ValueError("Provide either an encoder or a config")
            if not config.causal_attention:
                config = config.replace(causal_attention=True)
        elif not encoder.config.causal_attention:
            raise ValueError(
                "SASRecModel needs a causal encoder; build it from a config "
                "with causal_attention=True (or pass the config directly)")
        super().__init__(encoder=encoder, config=config,
                         special_token_ids=special_token_ids,
                         dtype_policy=dtype_policy)
