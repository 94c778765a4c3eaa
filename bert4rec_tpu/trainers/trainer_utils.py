"""Loss & metrics (reference ``bert4rec/trainers/trainer_utils.py:4-60``).

Identical math in jax: masked sparse categorical cross-entropy (pad label 0
excluded) and masked accuracy. Both are jit-safe pure functions returning
fp32 scalars.
"""

import jax
import jax.numpy as jnp


def masked_sparse_categorical_crossentropy(y_true: jnp.ndarray,
                                           logits: jnp.ndarray) -> jnp.ndarray:
    """SCCE(from_logits) over positions where ``y_true != 0``, mean over the
    unmasked count (reference trainer_utils.py:4-23).

    :param y_true: ``[B, P]`` int labels, 0 = padding
    :param logits: ``[B, P, V]`` fp logits
    """
    mask = (y_true != 0).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, y_true[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    total = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(nll * mask) / total


def masked_accuracy(y_true: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """argmax == label over non-pad positions (reference :26-60)."""
    mask = (y_true != 0).astype(jnp.float32)
    pred = jnp.argmax(logits, axis=-1).astype(y_true.dtype)
    correct = (pred == y_true).astype(jnp.float32)
    total = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(correct * mask) / total


def n_valid_positions(y_true: jnp.ndarray) -> jnp.ndarray:
    """Count of non-pad MLM positions (``y_true != 0``) in a batch, fp32.

    Used as the per-batch weight when aggregating batch-mean metrics into an
    epoch mean: ``sum(metric_b * n_valid_b) / sum(n_valid_b)`` is the exact
    mean over positions even when batches carry unequal numbers of valid
    positions (or padded rows, which contribute zero weight).
    """
    return jnp.sum((y_true != 0).astype(jnp.float32))


def n_real_positions(y_true: jnp.ndarray) -> jnp.ndarray:
    """Positions belonging to REAL rows (rows with at least one non-pad
    label), fp32. A padded final eval batch adds all-zero-label fake rows;
    the unmasked 'accuracy' denominator must exclude their positions (real
    rows always carry >= 1 prediction, so this never drops a real row)."""
    real_rows = jnp.any(y_true != 0, axis=-1).astype(jnp.float32)
    return jnp.sum(real_rows) * y_true.shape[-1]


def sparse_categorical_accuracy(y_true: jnp.ndarray,
                                logits: jnp.ndarray) -> jnp.ndarray:
    """Unmasked argmax accuracy (Keras SparseCategoricalAccuracy parity,
    reference bert4rec_trainer.py:13-35 metric list)."""
    pred = jnp.argmax(logits, axis=-1).astype(y_true.dtype)
    return jnp.mean((pred == y_true).astype(jnp.float32))
