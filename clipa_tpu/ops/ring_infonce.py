"""Ring-permuted global InfoNCE (shard_map + ppermute over the batch axis).

The pod-scale form of the bidirectional contrastive loss
(`losses.bidirectional_contrastive_loss`): instead of letting GSPMD
all-gather the full (B, C) text embeddings before one (B, B) logit matmul,
each device keeps only its own (b, C) shards and the text shard travels the
ring — compute of the current (b, b) logit block overlaps the ICI transfer
of the next shard, and no device ever materializes more than a (b, b)
block. This is the SURVEY §2.5 item-4 "chunked pod-scale InfoNCE" in its
ICI-native form (the reference reduces over NCCL after a full gather,
clipa_torch/training/distributed.py; clipa_jax gathers via pjit).

Exactness: equals the global loss in both directions (img->txt rows are
local; txt->img log-sum-exp accumulates into a packet that travels WITH the
text shard and is home after n hops). Verified to fp32 tolerance against
`bidirectional_contrastive_loss` on a virtual mesh in
tests/test_sharding.py.

Differentiability: plain `lax.scan` + `ppermute` (transpose of ppermute is
the reverse permute), with `jax.checkpoint` on the body so the backward
pass recomputes each (b, b) block instead of storing all n of them —
per-device live memory stays O(b*(C + b)) regardless of pod size.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

Array = jax.Array


def _ring_local(zimg, ztxt, t, *, axis_names, reduction):
    """Per-device body (runs inside shard_map)."""
    n = 1
    for a in axis_names:
        n *= jax.lax.axis_size(a)
    perm = None  # single-device fast path
    if n > 1:
        perm = [(j, (j + 1) % n) for j in range(n)]

    zimg = zimg.astype(jnp.float32)
    ztxt = ztxt.astype(jnp.float32)
    t = t.astype(jnp.float32)
    b = zimg.shape[0]

    # positives: the diagonal of the home block, O(b*C)
    pos = jnp.sum(zimg * ztxt, axis=-1) * t

    def body(carry, _):
        ztxt_rot, txt_lse, img_lse, img_max = carry
        block = jnp.dot(zimg, ztxt_rot.T,
                        precision=jax.lax.Precision.HIGHEST) * t
        img_lse = jnp.logaddexp(img_lse, jax.nn.logsumexp(block, axis=1))
        img_max = jnp.maximum(img_max, jnp.max(block, axis=1))
        txt_lse = jnp.logaddexp(txt_lse, jax.nn.logsumexp(block, axis=0))
        if perm is not None:
            # the text shard and its accumulator travel together; after n
            # hops both are back on their home device
            ztxt_rot = jax.lax.ppermute(ztxt_rot, axis_names, perm)
            txt_lse = jax.lax.ppermute(txt_lse, axis_names, perm)
        return (ztxt_rot, txt_lse, img_lse, img_max), ()

    neg_inf = jnp.full((b,), -jnp.inf, jnp.float32)
    carry = (ztxt, neg_inf, neg_inf, neg_inf)
    (ztxt_home, txt_lse, img_lse, img_max), _ = jax.lax.scan(
        jax.checkpoint(body), carry, None, length=n)
    del ztxt_home

    l = 0.5 * ((img_lse - pos) + (txt_lse - pos))
    ncorrect = (pos >= img_max).astype(jnp.float32)

    if reduction:
        def mean_all(x):
            return jax.lax.pmean(jnp.mean(x), axis_names)
        return mean_all(l), {"ncorrect": mean_all(ncorrect)}
    return l, {"ncorrect": ncorrect}


def ring_contrastive_loss(zimg: Array, ztxt: Array, t: Array, mesh,
                          axis_names: Sequence[str] = ("data", "fsdp"),
                          reduction: bool = True):
    """Drop-in for `bidirectional_contrastive_loss` on batch-sharded
    embeddings (no mask support — pretrain path only).

    Args:
      zimg, ztxt: (B, C) L2-normalized embeddings, sharded over
        `axis_names` along dim 0 (the training step's batch sharding).
      t: (1,) exp'd temperature (replicated).
      mesh: the jax.sharding.Mesh the step runs under.
      axis_names: mesh axes the batch is sharded over, in ring order.

    Returns:
      (scalar loss, {"ncorrect": scalar}) when reduction else per-row.
    """
    import inspect
    try:
        from jax import shard_map  # jax >= 0.6 (check_rep renamed)
        rep_kw = ("check_vma" if "check_vma"
                  in inspect.signature(shard_map).parameters
                  else None)
    except ImportError:
        from jax.experimental.shard_map import shard_map
        rep_kw = "check_rep"

    axis_names = tuple(axis_names)
    spec = P(axis_names)
    out_spec = P() if reduction else P(axis_names)

    fn = functools.partial(_ring_local, axis_names=axis_names,
                           reduction=reduction)
    kw = {rep_kw: False} if rep_kw else {}
    return shard_map(
        fn, mesh=mesh,
        in_specs=(spec, spec, P()),
        out_specs=(out_spec, {"ncorrect": out_spec}),
        **kw,
    )(zimg, ztxt, t)


def _ring_sigmoid_local(zimg, ztxt, t, bias, *, axis_names, reduction):
    """Per-device body of the ring sigmoid loss (runs inside shard_map)."""
    n = 1
    for a in axis_names:
        n *= jax.lax.axis_size(a)
    perm = None
    if n > 1:
        perm = [(j, (j + 1) % n) for j in range(n)]

    zimg = zimg.astype(jnp.float32)
    ztxt = ztxt.astype(jnp.float32)
    t = t.astype(jnp.float32)
    bias = jnp.asarray(bias, jnp.float32)
    b = zimg.shape[0]
    eye = jnp.eye(b, dtype=jnp.float32)

    def body(carry, i):
        ztxt_rot, acc = carry
        block = jnp.dot(zimg, ztxt_rot.T,
                        precision=jax.lax.Precision.HIGHEST) * t + bias
        # Positives live on the diagonal of the home block only (hop 0,
        # before any rotation — every device starts with its own shard).
        signs = 2.0 * eye * (i == 0) - 1.0
        acc = acc + jnp.sum(jax.nn.softplus(-signs * block), axis=1)
        if perm is not None:
            ztxt_rot = jax.lax.ppermute(ztxt_rot, axis_names, perm)
        return (ztxt_rot, acc), ()

    carry = (ztxt, jnp.zeros((b,), jnp.float32))
    (_, acc), _ = jax.lax.scan(jax.checkpoint(body), carry, jnp.arange(n))

    if reduction:
        return jax.lax.pmean(jnp.mean(acc), axis_names), {}
    return acc, {}


def ring_sigmoid_contrastive_loss(zimg: Array, ztxt: Array, t: Array, mesh,
                                  bias: Array = 0.0,
                                  axis_names: Sequence[str] = ("data",
                                                               "fsdp"),
                                  reduction: bool = True):
    """SigLIP's actual pod algorithm (arxiv.org/abs/2303.15343 §3.3): the
    pairwise sigmoid loss needs no global normalization, so the text shard
    just walks the ring and each device folds one (b, b) block of
    independent binary terms per hop — the full (B, B) matrix never exists
    anywhere, and there is no LSE packet to carry (unlike the softmax
    ring). Equals `losses.sigmoid_contrastive_loss` on the gathered batch
    exactly (values and gradients); verified in tests/test_sharding.py.

    Args match `ring_contrastive_loss`, plus `bias`: SigLIP's scalar logit
    bias (replicated).
    """
    import inspect
    try:
        from jax import shard_map
        rep_kw = ("check_vma" if "check_vma"
                  in inspect.signature(shard_map).parameters
                  else None)
    except ImportError:
        from jax.experimental.shard_map import shard_map
        rep_kw = "check_rep"

    axis_names = tuple(axis_names)
    spec = P(axis_names)
    out_spec = P() if reduction else P(axis_names)

    fn = functools.partial(_ring_sigmoid_local, axis_names=axis_names,
                           reduction=reduction)
    kw = {rep_kw: False} if rep_kw else {}
    return shard_map(
        fn, mesh=mesh,
        in_specs=(spec, spec, P(), P()),
        out_specs=(out_spec, {}),
        **kw,
    )(zimg, ztxt, t, jnp.asarray(bias, jnp.float32))
