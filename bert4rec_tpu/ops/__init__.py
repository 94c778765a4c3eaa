"""Pallas TPU kernels for the hot paths, each with an XLA fallback.

The shipped encoders are small (<=256 hidden, 2 layers, S<=200), so XLA's
fused attention is already near speed-of-light there; the kernels that pay
are the ones the reference spends its time in (SURVEY.md §3.3):

- :mod:`flash_attention` — fused masked self-attention (flag-gated; XLA
  fallback default for short sequences);
- :mod:`candidate_scoring` — the eval path's gather+tied-matmul scoring of
  101 candidates per masked position, fused so the [B,P,V] logits tensor is
  never materialized in HBM when only candidates are needed.
"""

from bert4rec_tpu.ops.flash_attention import flash_attention, mha_reference
from bert4rec_tpu.ops.candidate_scoring import (
    score_candidates, score_candidates_reference,
)
from bert4rec_tpu.ops.sharded_topk import exclusion_bias, topk_over_vocab

__all__ = ["flash_attention", "mha_reference", "score_candidates",
           "score_candidates_reference", "topk_over_vocab",
           "exclusion_bias"]
