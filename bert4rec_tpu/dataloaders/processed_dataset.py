"""A preprocessed (tokenized) dataset that materializes masked batches.

The reference applies MLM masking inside ``tf.data.Dataset.map`` with a
python escape hatch (bert4rec_preprocessor.py:118-122) and then accidentally
freezes the masks with ``.cache()`` (dataloader_utils.py:341-346).

Here, masking is *re-applied vectorized per epoch* from an explicit seed:
``ProcessedDataset`` holds the tokenized sequences plus preprocessing config
and produces fixed-shape int32 feature batches on demand — deterministic,
reproducible, and cheap enough to overlap with device compute.
"""

import dataclasses
from typing import List, Optional

import numpy as np

from bert4rec_tpu.dataloaders import dataloader_utils as utils


@dataclasses.dataclass
class MaskingConfig:
    max_seq_len: int
    max_predictions_per_seq: int
    mask_token_id: int
    pad_token_id: int
    unk_token_id: int
    masked_lm_rate: float = 0.2
    mask_token_rate: float = 1.0
    random_token_rate: float = 0.0

    @property
    def special_token_ids(self) -> list:
        return [self.unk_token_id, self.pad_token_id]


class ProcessedDataset:
    """Tokenized sequences + masking config; features materialize per epoch."""

    def __init__(self,
                 sequences: List[np.ndarray],
                 config: MaskingConfig,
                 vocab_size_fn,
                 apply_mlm: bool = True,
                 finetuning: Optional[np.ndarray] = None,
                 timestamps: Optional[List[np.ndarray]] = None):
        """
        :param vocab_size_fn: zero-arg callable returning the *current* vocab
            size (the tokenizer may still grow while extensible).
        :param finetuning: per-sequence bool array — True rows get last-token-
            only masking + tail truncation (the reference's finetuning mode).
        """
        self.sequences = [np.asarray(s, dtype=np.int32) for s in sequences]
        self.config = config
        self.vocab_size_fn = vocab_size_fn
        self.apply_mlm = apply_mlm
        if finetuning is None:
            finetuning = np.zeros(len(self.sequences), dtype=bool)
        elif np.isscalar(finetuning) or isinstance(finetuning, bool):
            finetuning = np.full(len(self.sequences), bool(finetuning))
        self.finetuning = np.asarray(finetuning, dtype=bool)
        self.timestamps = timestamps

    def __len__(self) -> int:
        return len(self.sequences)

    def cardinality(self) -> int:
        return len(self.sequences)

    def concatenate(self, other: "ProcessedDataset") -> "ProcessedDataset":
        ts = None
        if self.timestamps is not None and other.timestamps is not None:
            ts = list(self.timestamps) + list(other.timestamps)
        return ProcessedDataset(
            self.sequences + other.sequences, self.config, self.vocab_size_fn,
            self.apply_mlm,
            np.concatenate([self.finetuning, other.finetuning]), ts)

    # ------------------------------------------------------------------ #

    def materialize(self, seed: Optional[int] = None,
                    indices: Optional[np.ndarray] = None) -> dict:
        """Produce the full epoch's feature dict (fresh masks from ``seed``).

        Emits the reference's exact feature contract
        (bert4rec_preprocessor.py:101-114): ``labels``, ``input_word_ids``,
        ``input_mask`` [N, S] and, with mlm, ``masked_lm_ids``,
        ``masked_lm_positions``, ``masked_lm_weights`` [N, P]; plus
        ``input_timestamps`` when the temporal column is attached.
        """
        cfg = self.config
        rng = np.random.default_rng(seed)
        if indices is None:
            seqs = self.sequences
            ft = self.finetuning
            ts = self.timestamps
        else:
            seqs = [self.sequences[i] for i in indices]
            ft = self.finetuning[indices]
            ts = ([self.timestamps[i] for i in indices]
                  if self.timestamps is not None else None)

        # truncate: random window for training rows, tail for finetuning rows
        # (reference bert4rec_preprocessor.py:59-67). Windows must stay aligned
        # with timestamps, so compute starts once.
        starts = np.zeros(len(seqs), dtype=np.int64)
        for i, s in enumerate(seqs):
            over = len(s) - cfg.max_seq_len
            if over > 0:
                starts[i] = over if ft[i] else rng.integers(0, over + 1)
        trunc = [s[st:st + cfg.max_seq_len] for s, st in zip(seqs, starts)]

        input_ids, lengths = utils.pad_sequences(
            trunc, cfg.max_seq_len, cfg.pad_token_id)
        input_mask = (np.arange(cfg.max_seq_len)[None, :]
                      < lengths[:, None]).astype(np.int32)

        features = {
            "labels": input_ids.copy(),
            "input_word_ids": input_ids,
            "input_mask": input_mask,
        }

        if self.apply_mlm:
            masked = utils.apply_dynamic_masking_batch(
                input_ids, lengths,
                cfg.max_predictions_per_seq, cfg.mask_token_id,
                cfg.special_token_ids, self.vocab_size_fn(), rng,
                selection_rate=cfg.masked_lm_rate,
                mask_token_rate=cfg.mask_token_rate,
                random_token_rate=cfg.random_token_rate,
                finetuning=ft)
            features.update(masked)

        if ts is not None:
            ts_trunc = [np.asarray(t)[st:st + cfg.max_seq_len]
                        for t, st in zip(ts, starts)]
            ts_pad, _ = utils.pad_sequences(ts_trunc, cfg.max_seq_len, 0,
                                            dtype=np.int64)
            features["input_timestamps"] = ts_pad

        return features

    def batches(self,
                batch_size: int,
                shuffle: bool = True,
                seed: Optional[int] = None,
                drop_remainder: bool = False,
                pad_final_batch: bool = False):
        """Yield fixed-shape feature batches, re-masking this epoch."""
        features = self.materialize(seed)
        yield from utils.make_batches(
            features, batch_size, shuffle=shuffle, seed=seed,
            drop_remainder=drop_remainder, pad_final_batch=pad_final_batch)
