"""Vocab-SHARDED fused tied-softmax loss (shard_map + cross-shard stats).

For a table sharded over the 'model' mesh axis, the XLA logits path keeps
the ``[B*P, V]`` logits sharded but still materializes ``V/shards``-wide
fp32 slabs per chip (1.7 GB each for Reddit-scale 8-way). This op runs the
vocab-tiled flash-softmax kernels (ops/fused_mlm_loss.py) *per shard* under
``jax.shard_map`` and combines only the tiny per-row statistics across the
'model' axis:

    forward:  each shard sweeps its local table block -> (m, s, ll)
              per row; lse = pmax/psum-combined online logsumexp; the loss,
              metrics and per-row lse fall out — no logits in HBM anywhere.
              Accuracy is psum(label_logit) >= pmax(m), the same
              label-is-argmax formulation as the unsharded kernels.
    backward: each shard recomputes p = exp(logits_local - lse) tile-wise;
              dtable/dbias stay shard-local, dhidden is one psum.

Semantics match the unsharded kernels (and trainers/trainer_utils.py)
exactly; the only divergence from first-index argmax is exact fp ties for
the max (counted correct here — a measure-zero event for real logits).

The collectives ride the 'model' axis only; the batch ('data') axis is
reduced once at the end for the scalar outputs, so DPxTP meshes work
unchanged. SURVEY.md §7 hard part 3 (cross-shard tied softmax).
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from bert4rec_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
from bert4rec_tpu.ops import fused_mlm_loss as fml

NEG_INF = fml.NEG_INF


def _local_specs(mesh):
    data = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    return dict(
        hidden=P(data, None), labels=P(data),
        table=P(MODEL_AXIS, None), bias=P(MODEL_AXIS),
        lse=P(data, None),
    )


def _mask_local_bias(bias_l, offset, vocab_size):
    """NEG_INF on this shard's columns at/after the true vocab size —
    the kernels then see a fully valid local width."""
    col = jnp.arange(bias_l.shape[0]) + offset
    return jnp.where(col >= vocab_size, NEG_INF, bias_l)


def _shard_offset(v_local):
    return jax.lax.axis_index(MODEL_AXIS).astype(jnp.int32) * v_local


def _fwd_block(hidden_l, table_l, bias_l, labels_l, *, vocab_size,
               interpret, has_data_axis=True):
    v_local = table_l.shape[0]
    offset = _shard_offset(v_local)
    lab_local = labels_l.astype(jnp.int32) - offset
    # ownership only (label 0 included): the owner shard must report the
    # label-0 logit so the all-rows accuracy metric keeps parity with the
    # unsharded/XLA paths. The loss weight (labels > 0) is applied below.
    in_shard = ((labels_l >= 0) & (lab_local >= 0) & (lab_local < v_local))
    # remote/invalid labels -> -2: never matches a column, never counts
    lab_fwd = jnp.where(in_shard, lab_local, -2)
    bias_m = _mask_local_bias(bias_l, offset, vocab_size)

    m, s, ll = fml._run_forward_tiled_stats(
        hidden_l, table_l, bias_m, lab_fwd, v_local, interpret)

    big_m = jax.lax.pmax(m, MODEL_AXIS)
    big_s = jax.lax.psum(s * jnp.exp(m - big_m), MODEL_AXIS)
    lse = big_m + jnp.log(big_s)                            # [R, 1]
    label_logit = jax.lax.psum(ll, MODEL_AXIS)

    labels_col = labels_l.astype(jnp.int32)[:, None]
    w = (labels_col > 0).astype(jnp.float32)
    nll = (lse - label_logit) * w
    # "the label is the global argmax": its logit reaches the global max
    # (exactly the unsharded kernels' formulation — no argmax stat)
    correct = (label_logit >= big_m).astype(jnp.float32)

    # reduce the scalars over the data axis so every device agrees
    def data_sum(x):
        s = jnp.sum(x)
        return jax.lax.psum(s, DATA_AXIS) if has_data_axis else s

    return (data_sum(nll), data_sum(correct * w), data_sum(correct),
            data_sum(w), lse)


def _bwd_block(hidden_l, table_l, bias_l, labels_l, lse_l, g, nv, *,
               vocab_size, interpret, has_data_axis=True):
    v_local = table_l.shape[0]
    offset = _shard_offset(v_local)
    lab_local = labels_l.astype(jnp.int32) - offset
    valid = labels_l > 0
    in_shard = valid & (lab_local >= 0) & (lab_local < v_local)
    # valid remote labels -> positive sentinel past the local width
    # (weight 1, matches no column); invalid -> -1 (weight 0)
    lab_bwd = jnp.where(in_shard, lab_local,
                        jnp.where(valid, v_local + 7, -1))
    bias_m = _mask_local_bias(bias_l, offset, vocab_size)

    dh_l, dt_l, db_l = fml._run_backward_tiled(
        hidden_l, table_l, bias_m, lab_bwd, lse_l, g, nv, v_local,
        interpret, valid_ge_zero=True)
    dh = jax.lax.psum(dh_l, MODEL_AXIS)
    if has_data_axis:
        # each data replica saw only its batch slice: the table/bias grads
        # (replicated over 'data') must sum across replicas, exactly like
        # GSPMD's gradient all-reduce on the unsharded path
        dt_l = jax.lax.psum(dt_l, DATA_AXIS)
        db_l = jax.lax.psum(db_l, DATA_AXIS)
    return dh, dt_l, db_l


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def sharded_fused_mlm_loss(hidden, table, bias, labels, vocab_size,
                           mesh: Mesh, interpret: bool):
    """(loss_mean, masked_correct, all_correct, n_valid) — same contract as
    :func:`fused_mlm_loss`, for a 'model'-axis row-sharded table.

    :param hidden: ``[R, W]`` (R divisible by the 'data' axis)
    :param table: ``[Vp, W]``, rows divisible by the 'model' axis
    """
    (loss_sum, cv, ca, nv, _), _ = _fwd_impl(hidden, table, bias, labels,
                                             vocab_size, mesh, interpret)
    return loss_sum / jnp.maximum(nv, 1.0), cv, ca, nv


def _fwd_impl(hidden, table, bias, labels, vocab_size, mesh, interpret):
    sp = _local_specs(mesh)
    fn = jax.shard_map(
        functools.partial(_fwd_block, vocab_size=vocab_size,
                          interpret=interpret,
                          has_data_axis=DATA_AXIS in mesh.axis_names),
        mesh=mesh,
        in_specs=(sp["hidden"], sp["table"], sp["bias"], sp["labels"]),
        out_specs=(P(), P(), P(), P(), sp["lse"]),
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )
    loss_sum, cv, ca, nv, lse = fn(hidden, table, bias, labels)
    return (loss_sum, cv, ca, nv, lse), (hidden, table, bias, labels, lse,
                                         nv)


def _sharded_vjp_fwd(hidden, table, bias, labels, vocab_size, mesh,
                     interpret):
    (loss_sum, cv, ca, nv, _), residuals = _fwd_impl(
        hidden, table, bias, labels, vocab_size, mesh, interpret)
    loss = loss_sum / jnp.maximum(nv, 1.0)
    return (loss, cv, ca, nv), residuals


def _sharded_vjp_bwd(vocab_size, mesh, interpret, residuals, g):
    hidden, table, bias, labels, lse, nv = residuals
    sp = _local_specs(mesh)
    fn = jax.shard_map(
        functools.partial(_bwd_block, vocab_size=vocab_size,
                          interpret=interpret,
                          has_data_axis=DATA_AXIS in mesh.axis_names),
        mesh=mesh,
        in_specs=(sp["hidden"], sp["table"], sp["bias"], sp["labels"],
                  sp["lse"], P(), P()),
        out_specs=(sp["hidden"], sp["table"], sp["bias"]),
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )
    dh, dt, db = fn(hidden, table, bias, labels, lse,
                    jnp.asarray(g[0], jnp.float32),
                    jnp.asarray(nv, jnp.float32))
    return (dh.astype(hidden.dtype), dt.astype(table.dtype),
            db.astype(bias.dtype), None)


sharded_fused_mlm_loss.defvjp(_sharded_vjp_fwd, _sharded_vjp_bwd)


def sharded_mlm_loss_and_metrics(hidden, table, bias, labels, vocab_size,
                                 mesh, interpret=None):
    """(loss, logs) twin of ``fused_mlm_loss.mlm_loss_and_metrics`` for a
    vocab-sharded table."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    rows = hidden.shape[0] * hidden.shape[1] if hidden.ndim == 3 else \
        hidden.shape[0]
    hidden2 = hidden.reshape(rows, hidden.shape[-1])
    labels2 = labels.reshape(rows).astype(jnp.int32)
    loss, cv, ca, nv = sharded_fused_mlm_loss(
        hidden2, table, bias, labels2, vocab_size, mesh, interpret)
    logs = {
        "masked_accuracy": cv / jnp.maximum(nv, 1.0),
        "accuracy": ca / rows,
    }
    return loss, logs
