"""Int8 quantized matmuls for training (AQT-style), opt-in.

v5e's MXU runs int8 at ~1.5-2x its bf16 rate; this module makes the tower
matmuls (QKV/out projections + MLP) run as int8 x int8 -> int32 GEMMs with
dynamic symmetric scales:

    y = (q(x) @ q(w)) * sx * sw,   q(a) = round(clip(a / s * 127))

Scales are per-row of x (over the contraction dims) and per-output-column
of w — the finest granularity that still factors out of the matmul.
Backward keeps full precision (dx = g w^T, dw = x^T g with the original
operands — the standard AQT "quantized forward, high-precision backward"
recipe), implemented as a custom VJP.

The quantized contraction is expressed directly as ``lax.dot_general`` over
the operands' natural shapes — no reshapes, so XLA keeps the layouts the
surrounding ops want (reshape-to-2D forces padded physical copies of every
activation on TPU).

Enable per tower with `quant="int8"` in the model config.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _quantize(x: Array, axes: tuple):
    """Symmetric int8 quantization; scales reduce over `axes`."""
    amax = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def int8_dot_general(x: Array, w: Array, n_contract: int = 1,
                     quant_bwd: bool = False) -> Array:
    """Contracts the last n dims of x with the first n dims of w, int8 fwd.

    x: (*A, *C), w: (*C, *O) -> (*A, *O) in fp32. With quant_bwd, the two
    backward GEMMs (dx, dw) also run int8 (AQT-default full quantization).
    """
    return _fwd_value(x, w, n_contract)


def _dims(x_ndim: int, n: int):
    return tuple(range(x_ndim - n, x_ndim)), tuple(range(n))


def _fwd_value(x, w, n):
    cx, cw = _dims(x.ndim, n)
    qx, sx = _quantize(x.astype(jnp.float32), cx)    # (*A, 1...)
    qw, sw = _quantize(w.astype(jnp.float32), cw)    # (1..., *O)
    acc = jax.lax.dot_general(qx, qw, ((cx, cw), ((), ())),
                              preferred_element_type=jnp.int32)
    # sx: (*A, 1s over C) -> (*A, 1s over O); sw: (1s over C, *O) -> (*O)
    sx = sx.reshape(x.shape[:x.ndim - n] + (1,) * (w.ndim - n))
    sw = sw.reshape(w.shape[n:])
    return acc.astype(jnp.float32) * sx * sw


def _fwd(x, w, n, quant_bwd):
    return _fwd_value(x, w, n), (x, w)


def _qdot(a, b, dims_a, dims_b):
    """int8 x int8 -> fp32 dot_general with scales over the contraction."""
    qa, sa = _quantize(a, dims_a)
    qb, sb = _quantize(b, dims_b)
    acc = jax.lax.dot_general(qa, qb, ((dims_a, dims_b), ((), ())),
                              preferred_element_type=jnp.int32)
    out_a = [d for d in range(a.ndim) if d not in dims_a]
    out_b = [d for d in range(b.ndim) if d not in dims_b]
    sa = sa.reshape([a.shape[d] for d in out_a] + [1] * len(out_b))
    sb = sb.reshape([b.shape[d] for d in out_b])
    return acc.astype(jnp.float32) * sa * sb


def _bwd(n, quant_bwd, res, g):
    x, w = res
    g = g.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    n_a = x.ndim - n          # number of leading (batch-ish) dims of x
    n_o = w.ndim - n          # number of trailing output dims of w
    # dx (*A, *C) = g (*A, *O) . w (*C, *O) contracting O
    g_o = tuple(range(n_a, n_a + n_o))
    w_o = tuple(range(n, n + n_o))
    # dw (*C, *O) = x (*A, *C) . g (*A, *O) contracting A
    x_a = tuple(range(n_a))
    g_a = tuple(range(n_a))
    if quant_bwd:
        dx = _qdot(g, wf, g_o, w_o)
        dw = _qdot(xf, g, x_a, g_a)
    else:
        dx = jax.lax.dot_general(g, wf, ((g_o, w_o), ((), ())),
                                 preferred_element_type=jnp.float32)
        dw = jax.lax.dot_general(xf, g, ((x_a, g_a), ((), ())),
                                 preferred_element_type=jnp.float32)
    return dx.astype(x.dtype), dw.astype(w.dtype)


int8_dot_general.defvjp(_fwd, _bwd)


def int8_matmul(x: Array, w: Array) -> Array:
    """(M, K) x (K, N) int8-forward matmul (2D convenience wrapper)."""
    return int8_dot_general(x, w, 1)


def quant_dot(x: Array, kernel: Array, *, quant: str | None = None,
              n_contract: int = 1) -> Array:
    """(..., *C) x (*C, *out) contraction with optional int8 quantization.

    quant: None/"bf16" (plain), "int8" (forward only), "int8_full"
    (forward + both backward GEMMs).
    """
    if quant == "int8":
        return int8_dot_general(x, kernel, n_contract, False).astype(x.dtype)
    if quant == "int8_full":
        return int8_dot_general(x, kernel, n_contract, True).astype(x.dtype)
    if quant not in (None, "none", "bf16"):
        raise ValueError(f"Unknown quant mode {quant!r}")
    cx, cw = _dims(x.ndim, n_contract)
    return jax.lax.dot_general(x, kernel.astype(x.dtype),
                               ((cx, cw), ((), ())))
