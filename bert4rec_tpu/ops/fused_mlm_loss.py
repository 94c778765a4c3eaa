"""Fused tied-softmax masked cross-entropy (forward AND backward).

The train step's remaining large tensor is the full-vocab MLM logits
``[B*P, V]`` (fp32 ~150 MB at ML-1M scale): XLA materializes it for the
loss, again for log_softmax backward, and twice more for the accuracy
metrics' argmax. This kernel computes logits tile-by-tile in VMEM and
reduces them immediately:

forward:  per row-tile: logits = hidden @ table^T + bias (vocab-padding
          columns killed by NEG_INF pre-folded into the bias on the host —
          no per-tile mask pass), logsumexp, one-hot label logit,
          masked-SCCE loss sum, correct counts — HBM never sees a logits
          tensor. "correct" is label_logit >= row_max, i.e. "the label IS
          the argmax" without an argmax pass (identical to argmax == label
          up to exact fp ties, a measure-zero event; ties count correct
          here, incorrect under first-index argmax).
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
    """Whether the single-tile (whole-table-in-VMEM) kernel fits."""
    return estimate_vmem_bytes(v_padded, width) <= VMEM_BUDGET_BYTES


# flash-softmax variant tiling. The FORWARD streams the whole table
# through VMEM once per ROW TILE, so a taller row tile divides table HBM
# traffic (the merged backward streams it once total). NOTE the measured
# bottleneck at Reddit scale is VPU passes over the logits tiles, not
# bandwidth — see docs/ARCHITECTURE.md "Reddit-scale tiled-loss roofline".
# VTILE keeps the [R, VTILE] fp32 logits tiles inside VMEM (~4 MB each at
# R=1024; the VTILE=2048 probe overflows Mosaic VMEM).
VTILE = 1024
ROW_TILE_TILED = 1024

# Stream the table through the grid at COMPUTE precision. Every kernel
# casts each table block to hidden.dtype right after load, so pre-casting
# the whole table once outside the pallas_call is bit-identical — it only
# changes how many bytes the grid streams from HBM (2x fewer under the
# bf16 policy). Module-level so A/B harnesses can flip it per-trace.
STREAM_AT_COMPUTE_PRECISION = True


def _stream_table(table, hidden):
    if STREAM_AT_COMPUTE_PRECISION:
        return table.astype(hidden.dtype)
    return table


def fused_loss_available(v_padded: int, width: int) -> bool:
    """Whether ANY fused path applies: the single-tile kernel for small
    vocabs, else the vocab-tiled flash-softmax kernels (online logsumexp
    forward + two recompute sweeps backward) — which scale to any vocab
    whose table fits HBM (Reddit's 335k x 128 = 172 MB is fine)."""
    if fused_loss_supported(v_padded, width):
        return True
    # tiled path: per-block VMEM only; bound the HBM dt accumulator
    return 4 * v_padded * width <= 1 << 30


def _row_iota(n, v):
    return jax.lax.broadcasted_iota(jnp.int32, (n, v), 1)


def _mask_bias(bias, vocab_size):
    """NEG_INF on columns at/after the true vocab size — folded into the
    bias ONCE on the host so no kernel pays a [R, V]-wide mask pass per
    grid cell (the step is VPU-bound at large vocab; every elementwise
    sweep over the logits tile counts). exp(logit + NEG_INF - m)
    underflows to exactly 0, so losses/grads match the masked-logits
    formulation bit-for-bit."""
    if bias.shape[0] <= vocab_size:
        return bias
    col = jnp.arange(bias.shape[0])
    return jnp.where(col >= vocab_size, NEG_INF, bias)


def _tile_logits(hidden, table, bias):
    return jax.lax.dot_general(
        hidden, table, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias  # [R, Vp] fp32


def _fwd_kernel(hidden_ref, table_ref, bias_ref, labels_ref,
                loss_ref, cv_ref, ca_ref, nv_ref, *, v_padded):
    # everything stays rank-2: Mosaic cannot lower 1-D vector reductions
    # ("Not implemented: Offset change" on vector<1xN> multi_reduction)
    i = pl.program_id(0)
    hidden = hidden_ref[0]
    table = table_ref[:].astype(hidden.dtype)
    labels = labels_ref[:]                              # [R, 1] int32
    logits = _tile_logits(hidden, table, bias_ref[0])

    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
    # single select pass (vs onehot-materialize + multiply)
    label_logit = jnp.sum(
        jnp.where(_row_iota(hidden.shape[0], v_padded) == labels,
                  logits, 0.0), axis=-1, keepdims=True)
    w = (labels > 0).astype(jnp.float32)  # [R, 1]; 0 = pad, -1 = tile pad
    nll = (lse - label_logit) * w

    # "the label is the argmax" without an argmax pass; tile-pad rows
    # (label -1) never match a column so their label_logit is 0 — the
    # labels >= 0 guard keeps them out of the all-rows accuracy count
    correct = ((label_logit >= m) & (labels >= 0)).astype(jnp.float32)

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
                g_ref, dh_ref, dt_ref, db_ref, *, v_padded):
    i = pl.program_id(0)
    hidden = hidden_ref[0]
    table = table_ref[:].astype(hidden.dtype)
    labels = labels_ref[:]                              # [R, 1] int32
    logits = _tile_logits(hidden, table, bias_ref[0])

    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    # reciprocal broadcast-multiply: an [R, Vp] divide is far more VPU
    # cycles than a per-row reciprocal + multiply
    p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
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
    table = _stream_table(table, hidden)
    bias = _mask_bias(bias, vocab_size)
    v_padded = table.shape[0]
    tiles = rows // ROW_TILE
    kernel = functools.partial(_fwd_kernel, v_padded=v_padded)
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
    table = _stream_table(table, hidden)
    bias = _mask_bias(bias, vocab_size)
    v_padded = table.shape[0]
    tiles = rows // ROW_TILE
    kernel = functools.partial(_bwd_kernel, v_padded=v_padded)
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
    # whole-table-in-VMEM kernel when it fits, vocab-tiled otherwise
    fn = (fused_mlm_loss
          if fused_loss_supported(table.shape[0], table.shape[1])
          else fused_mlm_loss_tiled)
    loss, cv, ca, nv = fn(hidden2, table, bias, labels2,
                          vocab_size, interpret)
    logs = {
        "masked_accuracy": cv / jnp.maximum(nv, 1.0),
        "accuracy": ca / rows,
    }
    return loss, logs


# --------------------------------------------------------------------------- #
# vocab-tiled ("flash softmax") variant — any vocab size, per-block VMEM
# --------------------------------------------------------------------------- #
#
# forward: grid (row_tiles, v_tiles), v innermost. Per row tile, an online
# logsumexp runs across the vocab tiles (stats live in revisited
# [1, R, 1] output blocks, resident in VMEM for the whole inner sweep); the
# loss/metric scalars and the final per-row lse emit at the last tile.
# Accuracy is label_logit >= running_max — no argmax stat (the argmax pass
# was a pure-metric VPU cost on the vocab-scaled hot loop).
# backward: ONE recompute sweep when the whole [rows, W] dh gradient fits
# in VMEM as a grid-resident output block (constant index map -> written
# back once at grid end): grid (v_tiles, row_tiles) accumulates dt/db in
# consecutively-revisited blocks (resident across the inner row sweep) and
# scatters dh row-slices into the resident dh block — p = exp(logits-lse)
# and the dlog tile are computed ONCE instead of once per output operand.
# When dh is too large for residency (rows x W x 4 > _MERGED_DH_BYTES),
# fall back to TWO recompute sweeps (the flash-attention trick — without a
# resident dh, a single 2-D grid cannot keep both dh (accumulated over v)
# and dt (accumulated over rows) in consecutively-revisited blocks):
#   dh sweep: grid (row_tiles, v_tiles) — dh block i accumulates over j;
#   dt sweep: grid (v_tiles, row_tiles) — dt/db blocks j accumulate over i.
# All sweeps recompute p from the forward's saved lse.

# merged-backward applicability: the fp32 dh must stay VMEM-resident for
# the whole grid next to the [BWD_ROW_TILE, VTILE] fp32 logits/dlog tiles
# (a ~10 MB fixed working set). 5.5 MB = the largest MEASURED-compiling
# residency (Reddit bench: 10240 x 128 fp32 = 5.24 MB) + slack, NOT the
# theoretical ceiling — a bigger dh bound risks Mosaic VMEM OOM on
# untested row/width combinations; the two-sweep fallback always works
_MERGED_DH_BYTES = int(5.5 * 1024 * 1024)
# Reddit-scale A/B on v5e (B=256, P=40, 335k vocab): merged backward at
# row tile 1024 = 41.3 ms/step vs 42.9 (512) / 43.9 (256) / 48.7
# (two-sweep) — Mosaic keeps the live set (logits + p + dlog tiles +
# resident dh + dt) inside VMEM at 1024x1024 tiles with W=128
BWD_ROW_TILE = 1024


def _tile_logits_at(hidden, table, bias, col0):
    logits = jax.lax.dot_general(
        hidden, table, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias
    col = col0 + _row_iota(hidden.shape[0], logits.shape[1])
    return logits, col


def _fwd_kernel_tiled(hidden_ref, table_ref, bias_ref, labels_ref,
                      loss_ref, cv_ref, ca_ref, nv_ref, lse_ref,
                      m_ref, s_ref, ll_ref,
                      *, n_vtiles):
    i, j = pl.program_id(0), pl.program_id(1)
    hidden = hidden_ref[0]
    table = table_ref[:].astype(hidden.dtype)
    labels = labels_ref[:]                                # [R, 1]
    logits, col = _tile_logits_at(hidden, table, bias_ref[0], j * VTILE)

    t_m = jnp.max(logits, axis=-1, keepdims=True)         # [R, 1]
    t_s = jnp.sum(jnp.exp(logits - t_m), axis=-1, keepdims=True)
    # single select pass (vs onehot-materialize + multiply)
    t_ll = jnp.sum(jnp.where(col == labels, logits, 0.0),
                   axis=-1, keepdims=True)

    @pl.when(j == 0)
    def _():
        m_ref[0] = t_m
        s_ref[0] = t_s
        ll_ref[0] = t_ll

    @pl.when(j > 0)
    def _():
        m_prev = m_ref[0]
        new_m = jnp.maximum(m_prev, t_m)
        s_ref[0] = (s_ref[0] * jnp.exp(m_prev - new_m)
                    + t_s * jnp.exp(t_m - new_m))
        # the label lives in exactly one tile; elsewhere t_ll is 0
        ll_ref[0] += t_ll
        m_ref[0] = new_m

    @pl.when((i == 0) & (j == 0))
    def _():
        loss_ref[0, 0] = 0.0
        cv_ref[0, 0] = 0.0
        ca_ref[0, 0] = 0.0
        nv_ref[0, 0] = 0.0

    @pl.when(j == n_vtiles - 1)
    def _():
        lse = m_ref[0] + jnp.log(s_ref[0])
        lse_ref[0] = lse
        w = (labels > 0).astype(jnp.float32)
        nll = (lse - ll_ref[0]) * w
        # label-is-argmax without an argmax pass (see _fwd_kernel)
        correct = ((ll_ref[0] >= m_ref[0]) & (labels >= 0)).astype(
            jnp.float32)
        loss_ref[0, 0] += jnp.sum(nll)
        cv_ref[0, 0] += jnp.sum(correct * w)
        ca_ref[0, 0] += jnp.sum(correct)
        nv_ref[0, 0] += jnp.sum(w)


def _pad_vocab(table, bias):
    v = table.shape[0]
    pad = (-v) % VTILE
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((pad, table.shape[1]), table.dtype)], axis=0)
        bias = jnp.concatenate([bias, jnp.zeros((pad,), bias.dtype)])
    return table, bias, v


def _tiled_fwd_call(hidden, table, bias, labels, vocab_size, interpret):
    (hidden, n), (labels, _) = _pad_rows(hidden, ROW_TILE_TILED), \
        _pad_rows(labels, ROW_TILE_TILED)
    if labels.shape[0] > n:
        labels = labels.at[n:].set(-1)
    table, bias, _ = _pad_vocab(table, bias)
    table = _stream_table(table, hidden)
    bias = _mask_bias(bias, vocab_size)
    rows, w = hidden.shape
    vp = table.shape[0]
    tiles, vtiles = rows // ROW_TILE_TILED, vp // VTILE
    kernel = functools.partial(_fwd_kernel_tiled, n_vtiles=vtiles)
    stat = pl.BlockSpec((1, ROW_TILE_TILED, 1), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(tiles, vtiles),
        in_specs=[
            pl.BlockSpec((1, ROW_TILE_TILED, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((VTILE, w), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VTILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE_TILED, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                memory_space=pltpu.SMEM)] * 4
        + [stat] * 4,
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((tiles, ROW_TILE_TILED, 1), jnp.float32)] * 4,
        interpret=interpret,
    )(hidden.reshape(tiles, ROW_TILE_TILED, w), table, bias.reshape(1, -1),
      labels.reshape(rows, 1))
    return out, rows, n


def _run_forward_tiled(hidden, table, bias, labels, vocab_size, interpret):
    out, rows, n = _tiled_fwd_call(hidden, table, bias, labels, vocab_size,
                                   interpret)
    loss_sum, cv, ca, nv = (o[0, 0] for o in out[:4])
    lse = out[4].reshape(rows, 1)
    return loss_sum, cv, ca, nv, lse, n


def _run_forward_tiled_stats(hidden, table, bias, labels, vocab_size,
                             interpret):
    """Per-row online-softmax stats (no scalar reductions): used by the
    vocab-SHARDED loss, which combines stats across shards with
    pmax/psum before forming the loss (ops/sharded_mlm_loss.py).

    :returns: ``(m, s, ll)`` each ``[n, 1]`` fp32 — running max, sum-exp
        at ``m``, and label logit (0 if the label is not local). The
        caller reconstructs correctness as psum(ll) >= pmax(m) — "the
        label is the global argmax" — so no argmax stat is needed.
    """
    out, rows, n = _tiled_fwd_call(hidden, table, bias, labels, vocab_size,
                                   interpret)
    m, s, ll = (o.reshape(rows, 1)[:n] for o in out[5:8])
    return m, s, ll


def _bwd_merged_kernel(nvalid_ref, hidden_ref, table_ref, bias_ref,
                       labels_ref, lse_ref, g_ref, dh_ref, dt_ref, db_ref,
                       *, row_tile, valid_ge_zero=False):
    # grid (v_tiles, row_tiles): dt/db blocks (j) are resident across the
    # inner row sweep; dh is ONE whole-rows block (constant index map),
    # resident for the entire grid and written back once at the end
    j, i = pl.program_id(0), pl.program_id(1)
    hidden = hidden_ref[0]
    table = table_ref[:].astype(hidden.dtype)
    labels = labels_ref[:]
    logits, col = _tile_logits_at(hidden, table, bias_ref[0], j * VTILE)
    p = jnp.exp(logits - lse_ref[0])
    onehot = (col == labels).astype(jnp.float32)
    w = ((labels >= 0) if valid_ge_zero else (labels > 0)).astype(
        jnp.float32)
    scale = g_ref[0, 0] / jnp.maximum(nvalid_ref[0, 0], 1.0)
    dlog = (p - onehot) * (w * scale)
    dlog_t = dlog.astype(hidden.dtype)

    dh_update = jax.lax.dot_general(
        dlog_t, table, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    rows_slice = pl.ds(i * row_tile, row_tile)

    @pl.when(j == 0)
    def _():
        dh_ref[rows_slice, :] = dh_update

    @pl.when(j > 0)
    def _():
        dh_ref[rows_slice, :] += dh_update

    @pl.when(i == 0)
    def _():
        dt_ref[:] = jnp.zeros_like(dt_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dt_ref[:] += jax.lax.dot_general(
        dlog_t, hidden, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[0] += jnp.sum(dlog, axis=0)


def _run_backward_merged(hidden, table, bias, labels, lse, g, nvalid,
                         vocab_size, interpret, valid_ge_zero=False):
    (hidden_p, n), (labels_p, _) = _pad_rows(hidden, BWD_ROW_TILE), \
        _pad_rows(labels, BWD_ROW_TILE)
    if labels_p.shape[0] > n:
        labels_p = labels_p.at[n:].set(-1)
    lse_p, _ = _pad_rows(lse, BWD_ROW_TILE)
    table_p, bias_p, v_orig = _pad_vocab(table, bias)
    table_p = _stream_table(table_p, hidden)
    bias_p = _mask_bias(bias_p, vocab_size)
    rows, w = hidden_p.shape
    vp = table_p.shape[0]
    tiles, vtiles = rows // BWD_ROW_TILE, vp // VTILE
    smem = pl.BlockSpec((1, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM)

    dh, dt, db = pl.pallas_call(
        functools.partial(_bwd_merged_kernel, row_tile=BWD_ROW_TILE,
                          valid_ge_zero=valid_ge_zero),
        grid=(vtiles, tiles),
        in_specs=[
            smem,
            pl.BlockSpec((1, BWD_ROW_TILE, w), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((VTILE, w), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VTILE), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BWD_ROW_TILE, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BWD_ROW_TILE, 1), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            smem,
        ],
        out_specs=[
            # fp32 accumulators; dh's constant index map keeps the whole
            # [rows, W] gradient grid-resident in VMEM
            pl.BlockSpec((rows, w), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((VTILE, w), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VTILE), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, w), jnp.float32),
            jax.ShapeDtypeStruct((vp, w), jnp.float32),
            jax.ShapeDtypeStruct((1, vp), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.reshape(nvalid, (1, 1)).astype(jnp.float32),
      hidden_p.reshape(tiles, BWD_ROW_TILE, w), table_p,
      bias_p.reshape(1, -1), labels_p.reshape(rows, 1),
      lse_p.reshape(tiles, BWD_ROW_TILE, 1),
      jnp.reshape(g, (1, 1)).astype(jnp.float32))
    return dh[:n], dt[:v_orig], db.reshape(-1)[:v_orig]


def _bwd_dh_kernel(nvalid_ref, hidden_ref, table_ref, bias_ref, labels_ref,
                   lse_ref, g_ref, dh_ref, *, valid_ge_zero=False):
    j = pl.program_id(1)
    hidden = hidden_ref[0]
    table = table_ref[:].astype(hidden.dtype)
    labels = labels_ref[:]
    logits, col = _tile_logits_at(hidden, table, bias_ref[0], j * VTILE)
    p = jnp.exp(logits - lse_ref[0])                      # masked cols -> 0
    onehot = (col == labels).astype(jnp.float32)
    # sharded callers re-encode labels (local index / positive sentinel for
    # remote / -1 invalid), making >= 0 the validity test
    w = ((labels >= 0) if valid_ge_zero else (labels > 0)).astype(
        jnp.float32)
    scale = g_ref[0, 0] / jnp.maximum(nvalid_ref[0, 0], 1.0)
    dlog = ((p - onehot) * (w * scale)).astype(hidden.dtype)

    @pl.when(j == 0)
    def _():
        dh_ref[0] = jnp.zeros_like(dh_ref[0])

    dh_ref[0] += jax.lax.dot_general(
        dlog, table, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dh_ref.dtype)


def _bwd_dt_kernel(nvalid_ref, hidden_ref, table_ref, bias_ref, labels_ref,
                   lse_ref, g_ref, dt_ref, db_ref, *, valid_ge_zero=False):
    # grid is (v_tiles, row_tiles): block j is the OUTER dim here so the
    # dt/db accumulators stay resident across the inner row sweep
    i = pl.program_id(1)
    hidden = hidden_ref[0]
    table = table_ref[:].astype(hidden.dtype)
    labels = labels_ref[:]
    logits, col = _tile_logits_at(hidden, table, bias_ref[0],
                                  pl.program_id(0) * VTILE)
    p = jnp.exp(logits - lse_ref[0])
    onehot = (col == labels).astype(jnp.float32)
    w = ((labels >= 0) if valid_ge_zero else (labels > 0)).astype(
        jnp.float32)
    scale = g_ref[0, 0] / jnp.maximum(nvalid_ref[0, 0], 1.0)
    dlog = (p - onehot) * (w * scale)

    @pl.when(i == 0)
    def _():
        dt_ref[:] = jnp.zeros_like(dt_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dt_ref[:] += jax.lax.dot_general(
        dlog.astype(hidden.dtype), hidden, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[0] += jnp.sum(dlog, axis=0)


def _run_backward_tiled(hidden, table, bias, labels, lse, g, nvalid,
                        vocab_size, interpret, valid_ge_zero=False):
    rows_padded = hidden.shape[0] + ((-hidden.shape[0]) % BWD_ROW_TILE)
    if rows_padded * hidden.shape[1] * 4 <= _MERGED_DH_BYTES:
        return _run_backward_merged(hidden, table, bias, labels, lse, g,
                                    nvalid, vocab_size, interpret,
                                    valid_ge_zero)
    (hidden_p, n), (labels_p, _) = _pad_rows(hidden, ROW_TILE_TILED), \
        _pad_rows(labels, ROW_TILE_TILED)
    if labels_p.shape[0] > n:
        labels_p = labels_p.at[n:].set(-1)
    lse_p, _ = _pad_rows(lse, ROW_TILE_TILED)
    table_p, bias_p, v_orig = _pad_vocab(table, bias)
    table_p = _stream_table(table_p, hidden)
    bias_p = _mask_bias(bias_p, vocab_size)
    rows, w = hidden_p.shape
    vp = table_p.shape[0]
    tiles, vtiles = rows // ROW_TILE_TILED, vp // VTILE
    scalars = [jnp.reshape(nvalid, (1, 1)).astype(jnp.float32)]
    args = (hidden_p.reshape(tiles, ROW_TILE_TILED, w), table_p,
            bias_p.reshape(1, -1), labels_p.reshape(rows, 1),
            lse_p.reshape(tiles, ROW_TILE_TILED, 1),
            jnp.reshape(g, (1, 1)).astype(jnp.float32))
    smem = pl.BlockSpec((1, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM)

    dh = pl.pallas_call(
        functools.partial(_bwd_dh_kernel, valid_ge_zero=valid_ge_zero),
        grid=(tiles, vtiles),
        in_specs=[
            smem,
            pl.BlockSpec((1, ROW_TILE_TILED, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((VTILE, w), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VTILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE_TILED, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_TILE_TILED, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            smem,
        ],
        out_specs=pl.BlockSpec((1, ROW_TILE_TILED, w), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        # fp32 accumulator: dh sums across every vocab tile — bf16
        # accumulation over hundreds of partials would lose precision
        out_shape=jax.ShapeDtypeStruct((tiles, ROW_TILE_TILED, w),
                                       jnp.float32),
        interpret=interpret,
    )(*scalars, *args)

    dt, db = pl.pallas_call(
        functools.partial(_bwd_dt_kernel, valid_ge_zero=valid_ge_zero),
        grid=(vtiles, tiles),
        in_specs=[
            smem,
            pl.BlockSpec((1, ROW_TILE_TILED, w), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((VTILE, w), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VTILE), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE_TILED, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_TILE_TILED, 1), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            smem,
        ],
        out_specs=[
            pl.BlockSpec((VTILE, w), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VTILE), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((vp, w), jnp.float32),
            jax.ShapeDtypeStruct((1, vp), jnp.float32),
        ],
        interpret=interpret,
    )(*scalars, *args)

    return (dh.reshape(rows, w)[:n], dt[:v_orig],
            db.reshape(-1)[:v_orig])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_mlm_loss_tiled(hidden, table, bias, labels, vocab_size,
                         interpret):
    """Vocab-tiled twin of :func:`fused_mlm_loss` — same contract, any
    vocab size (online logsumexp across [VTILE]-wide table blocks)."""
    loss_sum, cv, ca, nv, _, _ = _run_forward_tiled(
        hidden, table, bias, labels, vocab_size, interpret)
    return loss_sum / jnp.maximum(nv, 1.0), cv, ca, nv


def _fused_tiled_fwd(hidden, table, bias, labels, vocab_size, interpret):
    loss_sum, cv, ca, nv, lse, _ = _run_forward_tiled(
        hidden, table, bias, labels, vocab_size, interpret)
    loss = loss_sum / jnp.maximum(nv, 1.0)
    return (loss, cv, ca, nv), (hidden, table, bias, labels, lse, nv)


def _fused_tiled_bwd(vocab_size, interpret, residuals, g):
    hidden, table, bias, labels, lse, nv = residuals
    dh, dt, db = _run_backward_tiled(hidden, table, bias, labels,
                                     lse[:hidden.shape[0]], g[0], nv,
                                     vocab_size, interpret)
    return (dh.astype(hidden.dtype), dt.astype(table.dtype),
            db.astype(bias.dtype), None)


fused_mlm_loss_tiled.defvjp(_fused_tiled_fwd, _fused_tiled_bwd)
