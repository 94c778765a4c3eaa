"""Fused tied-softmax masked cross-entropy (forward AND backward).

The train step's remaining large tensor is the full-vocab MLM logits
``[B*P, V]`` (fp32 ~150 MB at ML-1M scale): XLA materializes it for the
loss, again for log_softmax backward, and twice more for the accuracy
metrics' argmax. This kernel computes logits tile-by-tile in VMEM and
reduces them immediately:

forward:  per row-tile: logits = hidden @ table^T + bias (vocab-padding
          columns masked), logsumexp, one-hot label logit, masked-SCCE
          loss sum, argmax-correct counts — HBM never sees a logits tensor.
backward: recomputes the tile's softmax and emits
          dhidden = dlog @ table, dtable += dlog^T hidden, dbias += Σ dlog
          with dlog = w/n_valid * (softmax - onehot); the weight grads
          accumulate across the sequential TPU grid.

Semantics match trainers/trainer_utils.py exactly: loss = mean NLL over
labels != 0; masked accuracy over the same rows; plain accuracy over all
rows (reference SparseCategoricalAccuracy parity).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
ROW_TILE = 256

# per-core VMEM ~16 MB. The kernel holds the whole [Vp, W] table (input,
# fp32) + its fp32 grad accumulator + ~2 live [ROW_TILE, Vp] fp32 logits
# tiles; calibrated against the measured-working ML-1M config
# (Vp=3709, W=128 ≈ 11.4 MB by this estimate)
VMEM_BUDGET_BYTES = 15 * 1024 * 1024


def estimate_vmem_bytes(v_padded: int, width: int) -> int:
    return 8 * v_padded * width + 8 * ROW_TILE * v_padded


def fused_loss_supported(v_padded: int, width: int) -> bool:
    """Whether the fused tied-softmax loss fits VMEM for this table.

    False routes callers to the identical-math XLA path — e.g. ML-20M's
    26.7k-item vocab (27+ MB of table alone) or Reddit's 335k; those run
    the standard logits path (vocab-sharded on a mesh)."""
    return estimate_vmem_bytes(v_padded, width) <= VMEM_BUDGET_BYTES


def _row_iota(n, v):
    return jax.lax.broadcasted_iota(jnp.int32, (n, v), 1)


def _tile_logits(hidden, table, bias, vocab_size, v_padded):
    logits = jax.lax.dot_general(
        hidden, table, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias
    if v_padded > vocab_size:
        col = _row_iota(hidden.shape[0], v_padded)
        logits = jnp.where(col >= vocab_size, NEG_INF, logits)
    return logits  # [R, Vp] fp32


def _fwd_kernel(hidden_ref, table_ref, bias_ref, labels_ref,
                loss_ref, cv_ref, ca_ref, nv_ref, *, vocab_size, v_padded):
    # everything stays rank-2: Mosaic cannot lower 1-D vector reductions
    # ("Not implemented: Offset change" on vector<1xN> multi_reduction)
    i = pl.program_id(0)
    hidden = hidden_ref[0]
    table = table_ref[:].astype(hidden.dtype)
    labels = labels_ref[:]                              # [R, 1] int32
    logits = _tile_logits(hidden, table, bias_ref[0], vocab_size, v_padded)

    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
    onehot = (_row_iota(hidden.shape[0], v_padded)
              == labels).astype(jnp.float32)
    label_logit = jnp.sum(logits * onehot, axis=-1, keepdims=True)
    w = (labels > 0).astype(jnp.float32)  # [R, 1]; 0 = pad, -1 = tile pad
    nll = (lse - label_logit) * w

    pred = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)
    correct = (pred == labels).astype(jnp.float32)

    @pl.when(i == 0)
    def _():
        loss_ref[0, 0] = 0.0
        cv_ref[0, 0] = 0.0
        ca_ref[0, 0] = 0.0
        nv_ref[0, 0] = 0.0

    loss_ref[0, 0] += jnp.sum(nll)
    cv_ref[0, 0] += jnp.sum(correct * w)
    ca_ref[0, 0] += jnp.sum(correct)
    nv_ref[0, 0] += jnp.sum(w)


def _bwd_kernel(nvalid_ref, hidden_ref, table_ref, bias_ref, labels_ref,
                g_ref, dh_ref, dt_ref, db_ref, *, vocab_size, v_padded):
    i = pl.program_id(0)
    hidden = hidden_ref[0]
    table = table_ref[:].astype(hidden.dtype)
    labels = labels_ref[:]                              # [R, 1] int32
    logits = _tile_logits(hidden, table, bias_ref[0], vocab_size, v_padded)

    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    onehot = (_row_iota(hidden.shape[0], v_padded)
              == labels).astype(jnp.float32)
    w = (labels > 0).astype(jnp.float32)  # [R, 1]; 0 = pad, -1 = tile pad
    scale = g_ref[0, 0] / jnp.maximum(nvalid_ref[0, 0], 1.0)
    dlog = (p - onehot) * (w * scale)                   # [R, Vp] fp32

    dlog_t = dlog.astype(hidden.dtype)
    dh_ref[0] = jax.lax.dot_general(
        dlog_t, table, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dh_ref.dtype)

    @pl.when(i == 0)
    def _():
        dt_ref[:] = jnp.zeros_like(dt_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dt_ref[:] += jax.lax.dot_general(
        dlog_t, hidden, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[0] += jnp.sum(dlog, axis=0)


def _pad_rows(x, r):
    n = x.shape[0]
    pad = (-n) % r
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x, n


def _run_forward(hidden, table, bias, labels, vocab_size, interpret):
    (hidden, n), (labels, _) = _pad_rows(hidden, ROW_TILE), \
        _pad_rows(labels, ROW_TILE)
    if labels.shape[0] > n:
        # padded rows get label -1: zero loss weight AND never argmax-correct
        labels = labels.at[n:].set(-1)
    rows, w = hidden.shape
    v_padded = table.shape[0]
    tiles = rows // ROW_TILE
    kernel = functools.partial(_fwd_kernel, vocab_size=vocab_size,
                               v_padded=v_padded)
    out = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, ROW_TILE, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v_padded, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v_padded), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)] * 4,
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 4,
        interpret=interpret,
    )(hidden.reshape(tiles, ROW_TILE, w), table, bias.reshape(1, -1),
      labels.reshape(rows, 1))
    loss_sum, cv, ca, nv = (o[0, 0] for o in out)
    return loss_sum, cv, ca, nv, n


def _run_backward(hidden, table, bias, labels, g, nvalid, vocab_size,
                  interpret):
    (hidden_p, n), (labels_p, _) = _pad_rows(hidden, ROW_TILE), \
        _pad_rows(labels, ROW_TILE)
    rows, w = hidden_p.shape
    v_padded = table.shape[0]
    tiles = rows // ROW_TILE
    kernel = functools.partial(_bwd_kernel, vocab_size=vocab_size,
                               v_padded=v_padded)
    dh, dt, db = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),     # n_valid
            pl.BlockSpec((1, ROW_TILE, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v_padded, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v_padded), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),     # g
        ],
        out_specs=[
            pl.BlockSpec((1, ROW_TILE, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v_padded, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v_padded), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles, ROW_TILE, w), hidden.dtype),
            jax.ShapeDtypeStruct((v_padded, w), jnp.float32),
            jax.ShapeDtypeStruct((1, v_padded), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.reshape(nvalid, (1, 1)).astype(jnp.float32),
      hidden_p.reshape(tiles, ROW_TILE, w), table, bias.reshape(1, -1),
      labels_p.reshape(rows, 1),
      jnp.reshape(g, (1, 1)).astype(jnp.float32))
    return dh.reshape(rows, w)[:n], dt, db.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_mlm_loss(hidden, table, bias, labels, vocab_size, interpret):
    """(loss_mean, masked_correct, all_correct, n_valid) over flat rows.

    :param hidden: ``[R, W]`` transformed masked-position states
    :param table: ``[Vp, W]`` tied table (rows may include vocab padding)
    :param bias: ``[Vp]``; ``labels``: ``[R]`` int32 (0 = padding row)
    """
    loss_sum, cv, ca, nv, _ = _run_forward(hidden, table, bias, labels,
                                           vocab_size, interpret)
    return loss_sum / jnp.maximum(nv, 1.0), cv, ca, nv


def _fused_fwd(hidden, table, bias, labels, vocab_size, interpret):
    loss_sum, cv, ca, nv, _ = _run_forward(hidden, table, bias, labels,
                                           vocab_size, interpret)
    loss = loss_sum / jnp.maximum(nv, 1.0)
    return (loss, cv, ca, nv), (hidden, table, bias, labels, nv)


def _fused_bwd(vocab_size, interpret, residuals, g):
    hidden, table, bias, labels, nv = residuals
    g_loss = g[0]
    dh, dt, db = _run_backward(hidden, table, bias, labels, g_loss, nv,
                               vocab_size, interpret)
    return dh, dt.astype(table.dtype), db.astype(bias.dtype), None


fused_mlm_loss.defvjp(_fused_fwd, _fused_bwd)


def mlm_loss_and_metrics(hidden, table, bias, labels, vocab_size,
                         interpret=None):
    """Convenience wrapper returning (loss, logs-dict); logs match the
    trainer's metric names (masked_accuracy / accuracy)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    rows = hidden.shape[0] * hidden.shape[1] if hidden.ndim == 3 else \
        hidden.shape[0]
    hidden2 = hidden.reshape(rows, hidden.shape[-1])
    labels2 = labels.reshape(rows).astype(jnp.int32)
    loss, cv, ca, nv = fused_mlm_loss(hidden2, table, bias, labels2,
                                      vocab_size, interpret)
    logs = {
        "masked_accuracy": cv / jnp.maximum(nv, 1.0),
        "accuracy": ca / rows,
    }
    return loss, logs
