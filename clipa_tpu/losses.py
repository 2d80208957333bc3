"""Losses.

Capability parity with clipa_jax/losses/common.py, re-designed for the
jit+Mesh SPMD world:

* :func:`bidirectional_contrastive_loss` is written as *global* math over the
  full (global-batch) embedding matrices. Under GSPMD with batch-sharded
  inputs, XLA partitions the B x B logit matmul so each device only ever
  materializes its local rows — the same memory profile as the reference's
  hand-written `local_loss` + axis_index label offset
  (clipa_jax/losses/common.py:72-94), without any per-device bookkeeping.
* For pod-scale batches where even local rows x global columns is too big,
  `clipa_tpu.ops.infonce.chunked_contrastive_loss` streams column chunks with
  an online logsumexp (exactly equal result, bounded memory).
* :func:`sigmoid_contrastive_loss` is the SigLIP-style pairwise loss for the
  bigG stretch config.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def bidirectional_contrastive_loss(zimg: Array, ztxt: Array, t: Array,
                                   mask: Optional[Array] = None,
                                   reduction: bool = False):
    """Bidirectional InfoNCE over global batches.

    Args:
      zimg, ztxt: (B, C) L2-normalized embeddings (global batch).
      t: scalar (or (1,)) temperature, already exp'd.
      mask: optional (B,) validity mask; masked rows/cols are excluded.
      reduction: mean-reduce to a scalar.

    Returns:
      (loss, {"ncorrect": ...})
    """
    # fp32 logits: the LSE over 10k+ columns is precision-sensitive.
    logits = jnp.dot(zimg.astype(jnp.float32), ztxt.astype(jnp.float32).T,
                     precision=jax.lax.Precision.HIGHEST) * t

    if mask is not None:
        exclude = jnp.logical_not(mask)
        exclude = jnp.logical_or(exclude[:, None], exclude[None, :])
        logits = jnp.where(exclude, -jnp.inf, logits)

    l1 = -jnp.diag(jax.nn.log_softmax(logits, axis=1))  # img -> txt NLL
    l2 = -jnp.diag(jax.nn.log_softmax(logits, axis=0))  # txt -> img NLL
    l = 0.5 * (l1 + l2)

    if mask is not None:
        l = jnp.where(mask, l, 0)

    if reduction and mask is not None:
        def redux(x):
            return jnp.sum(x * mask) / (jnp.sum(mask) + 1e-8)
    elif reduction:
        redux = jnp.mean
    else:
        def redux(x):
            return x

    ncorrect = jnp.argmax(logits, axis=1) == jnp.arange(logits.shape[0])
    return redux(l), {"ncorrect": redux(ncorrect)}


def local_contrastive_loss(local_img: Array, local_txt: Array,
                           global_img: Array, global_txt: Array, t: Array,
                           rank, reduction: bool = True):
    """Per-device InfoNCE rows against gathered global columns.

    For use inside ``shard_map`` when the loss is computed per device
    explicitly (reference semantics: clipa_jax/losses/common.py:72-94 with
    label offset rank * local_batch). Equals the global loss exactly.
    """
    b_local = local_img.shape[0]
    labels = rank * b_local + jnp.arange(b_local)

    logits_img = jnp.dot(local_img.astype(jnp.float32),
                         global_txt.astype(jnp.float32).T,
                         precision=jax.lax.Precision.HIGHEST) * t
    logits_txt = jnp.dot(local_txt.astype(jnp.float32),
                         global_img.astype(jnp.float32).T,
                         precision=jax.lax.Precision.HIGHEST) * t

    l1 = -jnp.take_along_axis(jax.nn.log_softmax(logits_img, axis=1),
                              labels[:, None], axis=1)[:, 0]
    l2 = -jnp.take_along_axis(jax.nn.log_softmax(logits_txt, axis=1),
                              labels[:, None], axis=1)[:, 0]
    l = 0.5 * (l1 + l2)
    ncorrect = jnp.argmax(logits_img, axis=1) == labels
    redux = jnp.mean if reduction else (lambda x: x)
    return redux(l), {"ncorrect": redux(ncorrect)}


def distill_contrastive_loss(zimg: Array, ztxt: Array, t: Array,
                             t_zimg: Array, t_ztxt: Array, t_t: Array):
    """InfoNCE + soft-label distillation from a teacher two-tower.

    Reference semantics: clipa_torch/open_clip/loss.py:201-238
    (DistillClipLoss) with the trainer summing both terms
    (training/train.py:210-213). The teacher's B x B logits (its OWN
    temperature) provide soft targets for the student's logits, both
    directions, via soft cross-entropy; the ordinary contrastive loss is
    kept at weight 1. Teacher embeddings must carry no gradient (stopped
    here again for safety).

    Returns (total, {"contrastive_loss", "distill_loss", "ncorrect"}).
    """
    t_zimg = jax.lax.stop_gradient(t_zimg)
    t_ztxt = jax.lax.stop_gradient(t_ztxt)
    t_t = jax.lax.stop_gradient(t_t)

    def _logits(a, b, temp):
        return jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32).T,
                       precision=jax.lax.Precision.HIGHEST) * temp

    logits_img = _logits(zimg, ztxt, t)       # (B, B): image rows
    logits_txt = logits_img.T                 # text rows (same matrix)
    d_logits_img = _logits(t_zimg, t_ztxt, t_t)
    d_logits_txt = d_logits_img.T

    labels = jnp.arange(logits_img.shape[0])
    l1 = -jnp.diag(jax.nn.log_softmax(logits_img, axis=1))
    l2 = -jnp.diag(jax.nn.log_softmax(logits_txt, axis=1))
    contrastive = 0.5 * jnp.mean(l1 + l2)

    def soft_ce(teacher_logits, student_logits):
        p = jax.nn.softmax(teacher_logits, axis=1)
        return jnp.mean(-jnp.sum(
            p * jax.nn.log_softmax(student_logits, axis=1), axis=1))

    distill = 0.5 * (soft_ce(d_logits_img, logits_img)
                     + soft_ce(d_logits_txt, logits_txt))

    ncorrect = jnp.mean(jnp.argmax(logits_img, axis=1) == labels)
    return contrastive + distill, {
        "contrastive_loss": contrastive,
        "distill_loss": distill,
        "ncorrect": ncorrect,
    }


def sigmoid_contrastive_loss(zimg: Array, ztxt: Array, t: Array,
                             bias: Array = 0.0, reduction: bool = True):
    """SigLIP-style pairwise sigmoid loss (arxiv.org/abs/2303.15343).

    Every (i, j) pair is an independent binary problem: positives on the
    diagonal. No softmax normalization -> no global LSE -> trivially chunkable
    at pod scale.
    """
    logits = jnp.dot(zimg.astype(jnp.float32), ztxt.astype(jnp.float32).T,
                     precision=jax.lax.Precision.HIGHEST) * t + bias
    b = logits.shape[0]
    signs = 2 * jnp.eye(b, dtype=jnp.float32) - 1.0  # +1 diag, -1 off-diag
    # -log sigmoid(sign * logit), numerically via softplus(-x).
    nll = jax.nn.softplus(-signs * logits)
    l = jnp.sum(nll, axis=1)
    return (jnp.mean(l) if reduction else l), {}


def coca_loss(zimg: Array, ztxt: Array, t: Array, logits: Array,
              labels: Array, *, clip_loss_weight: float = 1.0,
              caption_loss_weight: float = 2.0, pad_id: int = 0):
    """CoCa objective: weighted InfoNCE + next-token caption CE.

    Reference CoCaLoss (clipa_torch/open_clip/loss.py:160-199):
    clip_loss_weight * ClipLoss + caption_loss_weight *
    CrossEntropyLoss(ignore_index=pad_id)(logits, labels) — the CE mean is
    over non-pad positions only (torch ignore_index semantics). Default
    weights are the reference trainer flags (--coca-caption-loss-weight 2,
    --coca-contrastive-loss-weight 1).
    """
    clip_l, extras = bidirectional_contrastive_loss(zimg, ztxt, t,
                                                    reduction=True)
    log_p = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(log_p, labels[..., None], axis=-1)[..., 0]
    keep = (labels != pad_id).astype(jnp.float32)
    caption_l = jnp.sum(nll * keep) / jnp.maximum(jnp.sum(keep), 1.0)
    loss = clip_loss_weight * clip_l + caption_loss_weight * caption_l
    return loss, {**extras, "contrastive_loss": clip_loss_weight * clip_l,
                  "caption_loss": caption_loss_weight * caption_l}


def sigmoid_xent(*, logits, labels, reduction: bool = True):
    """Stable elementwise sigmoid cross-entropy."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    nll = -jnp.sum(labels * log_p + (1.0 - labels) * log_not_p, axis=-1)
    return jnp.mean(nll) if reduction else nll


def softmax_xent(*, logits, labels, reduction: bool = True, kl: bool = False,
                 axis: int = -1):
    log_p = jax.nn.log_softmax(logits, axis=axis)
    nll = -jnp.sum(labels * log_p, axis=axis)
    if kl:
        nll += jnp.sum(labels * jnp.log(jnp.clip(labels, 1e-8)), axis=axis)
    return jnp.mean(nll) if reduction else nll


def bce_logits(*, logits, labels, weight=None, reduction: bool = True):
    """Stable binary cross-entropy with logits."""
    max_val = jnp.clip(logits, 0, None)
    loss = logits - logits * labels + max_val + \
        jnp.log(jnp.exp(-max_val) + jnp.exp(-logits - max_val))
    if weight is not None:
        loss = loss * weight
    return jnp.mean(loss) if reduction else loss


def weighted_softmax_xent(*, logits, labels, reduction: bool = True,
                          weights=None, label_smoothing: float = 0.0,
                          normalize: bool = True):
    """Token-level cross-entropy over (B, L, V) logits / (B, L) int labels."""
    if logits.ndim != labels.ndim + 1:
        raise ValueError(f"Bad shapes: {logits.shape} vs {labels.shape}")
    vocab = logits.shape[-1]
    confidence = 1.0 - label_smoothing
    low = label_smoothing / (vocab - 1)
    onehot = jax.nn.one_hot(labels, vocab)
    soft = onehot * confidence + (1.0 - onehot) * low
    loss = -jnp.sum(soft * jax.nn.log_softmax(logits), axis=-1)
    norm = labels.shape[1]
    if weights is not None:
        loss = loss * weights
        norm = weights.sum(axis=1)
    loss = loss.sum(axis=1)
    if normalize:
        loss = loss / norm
    return loss.mean() if reduction else loss


def mae_loss(*, pred, target, mask, norm_pix_loss: bool = True):
    """Per-patch MSE on masked patches (MAE-style)."""
    if norm_pix_loss:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True) * \
            target.shape[-1] / (target.shape[-1] - 1)
        target = (target - mean) / (var + 1e-6) ** 0.5
    loss = ((pred - target) ** 2).mean(axis=-1)
    return (loss * mask).sum() / mask.sum()
