"""Encoder configuration.

Mirrors the constructor surface of the reference encoder
(reference bert4rec/models/components/networks/bert4rec_encoder.py:62-93),
including the V1-kwarg aliases (:81-93), as a frozen dataclass that also
round-trips the 13 shipped JSON config files
(reference bert4rec/config/bert4rec_train_configs/*.json with keys
``attention_dropout, output_dropout, hidden_size, inner_dim,
max_sequence_length, num_attention_heads, num_layers``).
"""

import dataclasses
import json
import pathlib
from typing import Optional

# Reference V1 kwarg names -> canonical names
# (reference bert4rec_encoder.py:81-93)
_V1_ALIASES = {
    "num_hidden_layers": "num_layers",
    "intermediate_size": "inner_dim",
    "hidden_activation": "inner_activation",
    "hidden_dropout_rate": "output_dropout",
    "attention_dropout_rate": "attention_dropout",
    "max_position_embeddings": "max_sequence_length",
    "dropout_rate": "output_dropout",
}


@dataclasses.dataclass(frozen=True)
class BERT4RecConfig:
    """Hyperparameters of the bidirectional encoder + MLM head.

    Defaults are BERT-Base, matching the reference encoder defaults
    (bert4rec_encoder.py:62-79).
    """
    vocab_size: int
    hidden_size: int = 768
    num_layers: int = 12
    num_attention_heads: int = 12
    inner_dim: int = 3072
    inner_activation: str = "gelu"
    output_dropout: float = 0.1
    attention_dropout: float = 0.1
    max_sequence_length: int = 512
    initializer_range: float = 0.02
    # factorized embedding: table width != hidden size => linear projection
    # (reference bert4rec_encoder.py:124-131)
    embedding_width: Optional[int] = None
    norm_first: bool = False
    # use the fused Pallas attention kernel (ops/flash_attention.py) when
    # attention dropout is inactive; XLA attention otherwise
    use_flash_attention: bool = False
    # fuse each whole post-LN encoder layer into one Pallas kernel
    # (ops/fused_encoder_layer.py) — subsumes use_flash_attention
    use_fused_layer: bool = False
    # fuse the tied-softmax masked cross-entropy + accuracy metrics into a
    # Pallas kernel (ops/fused_mlm_loss.py) — the [B*P, V] logits tensor is
    # never materialized in HBM during training
    use_fused_loss: bool = False
    # round the embedding-table / output-bias vocab dimension up to a
    # multiple of this, so it divides the 'model' mesh axis for vocab
    # sharding; logits of padding ids are masked to -1e9
    vocab_pad_to: Optional[int] = None
    # training-time feature contract
    max_predictions_per_seq: int = 40
    # BEYOND-PARITY: consume the temporal preprocessor's aligned
    # ``input_timestamps`` (the reference ships the preprocessor but no
    # model consumes it). When enabled, a learned embedding over
    # log2-bucketized recency (time before the sequence's newest event) is
    # added to the token+position embeddings; batches without timestamps
    # fall back to bucket 0 (a learned "no signal" vector).
    use_temporal_embeddings: bool = False
    temporal_buckets: int = 32
    # BEYOND-PARITY: TiSASRec-style relative time-interval attention — a
    # learned per-head additive attention bias indexed by the signed
    # log2-bucketized time delta between the query and key events
    # (Li et al., WSDM 2020, adapted to the bidirectional encoder).
    # Zero-initialized, so enabling it starts math-identical to the
    # baseline; requires ``input_timestamps`` to carry any signal (without
    # them every pair lands in bucket 0). Runs on the XLA attention path
    # (the fused/flash kernels take no dense bias and fall back).
    use_temporal_attention: bool = False
    temporal_attention_buckets: int = 64
    # BEYOND-PARITY: causal (left-to-right) self-attention — the SASRec
    # model family's encoder mode. Position i attends only to positions
    # <= i. Runs on the fused-layer/flash kernels (in-VMEM triangle mask)
    # with the usual XLA fallback.
    causal_attention: bool = False
    # rematerialize each encoder layer under autodiff (jax.checkpoint):
    # backward recomputes the layer's activations instead of keeping them
    # in HBM — O(1) layer activations live at a time instead of O(L), the
    # standard FLOPs-for-HBM trade for deep/base-size configs. Applies to
    # the unfused (XLA/flash) layer path; the fused Pallas layer already
    # recomputes everything in its hand-written backward kernel.
    remat: bool = False

    def __post_init__(self):
        if self.hidden_size % self.num_attention_heads != 0:
            raise ValueError(
                f"hidden_size={self.hidden_size} must be divisible by "
                f"num_attention_heads={self.num_attention_heads}")

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def table_width(self) -> int:
        """Width of the item-embedding table (embedding_width if factorized)."""
        return self.embedding_width or self.hidden_size

    @property
    def padded_vocab_size(self) -> int:
        """Row count of the embedding table / output bias (>= vocab_size)."""
        if not self.vocab_pad_to:
            return self.vocab_size
        m = self.vocab_pad_to
        return ((self.vocab_size + m - 1) // m) * m

    # ------------------------------------------------------------------ #

    @classmethod
    def from_dict(cls, d: dict, **overrides) -> "BERT4RecConfig":
        d = {_V1_ALIASES.get(k, k): v for k, v in d.items()}
        d.update(overrides)
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise ValueError(f"Unknown config keys: {sorted(unknown)}")
        return cls(**d)

    @classmethod
    def from_json_file(cls, path, **overrides) -> "BERT4RecConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f), **overrides)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json_file(self, path) -> None:
        path = pathlib.Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    def replace(self, **kwargs) -> "BERT4RecConfig":
        return dataclasses.replace(self, **kwargs)
