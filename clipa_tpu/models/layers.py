"""Shared transformer building blocks.

Our own primitives rather than stock ``flax.linen`` attention: the attention
core dispatches to a Pallas flash-attention kernel on TPU (falling back to an
XLA einsum-softmax path), and every matmul runs in a configurable compute
dtype (bf16 by default on TPU) with fp32 parameters — the MXU-friendly
regime. Parameter *names and shapes* intentionally coincide with the
reference tree (clipa_jax/models/vit.py, text_transformer.py) so released
CLIPA npz checkpoints load unchanged:

    MultiHeadDotProductAttention_0/{query,key,value}/kernel  (d, H, hd)
    MultiHeadDotProductAttention_0/out/kernel                (H, hd, d)
    MlpBlock_0/{Dense_0,Dense_1}/{kernel,bias}
    LayerNorm_0, LayerNorm_1
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clipa_tpu.ops.attention import multi_head_attention
from clipa_tpu.ops.quantization import quant_dot

Array = Any
Dtype = Any


class DropPath(nn.Module):
    """Stochastic depth: drops the entire residual branch per sample.

    With `seq_len` set the input is the flat (B*L, D) residual stream;
    the per-SAMPLE drop mask is repeated across each sample's rows.
    """

    rate: float = 0.0
    seq_len: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("drop_path")
        if x.ndim == 2 and self.seq_len:
            b = x.shape[0] // self.seq_len
            mask = jax.random.bernoulli(rng, keep, (b, 1))
            mask = jnp.repeat(mask, self.seq_len, axis=0)
        else:
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class MultiHeadAttention(nn.Module):
    """Multi-head self/cross attention with a swappable core.

    QKV/out projections are explicit einsums over DenseGeneral-shaped
    parameters; the (Q,K,V)->O core is `clipa_tpu.ops.attention`, which picks
    a Pallas flash kernel or the XLA path depending on backend and shapes.
    """

    num_heads: int
    qkv_kernel_init: Callable = nn.initializers.xavier_uniform()
    out_kernel_init: Callable = nn.initializers.xavier_uniform()
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    attn_impl: str = "auto"  # "auto" | "xla" | "pallas"
    quant: Optional[str] = None  # None | "int8"
    # Static sequence length when the inputs are the flat (B*L, D) stream.
    seq_len: Optional[int] = None

    @nn.compact
    def __call__(self, inputs_q: Array, inputs_kv: Array,
                 mask: Optional[Array] = None) -> Array:
        d_model = inputs_q.shape[-1]
        if d_model % self.num_heads:
            raise ValueError(f"width {d_model} not divisible by heads {self.num_heads}")
        head_dim = d_model // self.num_heads
        dtype = self.dtype or inputs_q.dtype

        # Explicit sub-scopes so flat param names match the reference layout.
        # Projections keep the packed (B, L, D) layout end to end: a 4D
        # (B, L, H, head_dim) tensor lane-pads head_dim 64 -> 128 in TPU HBM
        # (2x the bytes for every q/k/v/out buffer); heads are split
        # on-chip by the attention core instead. Projection biases are NOT
        # added here: the attention core either fuses them into its kernels
        # (so the backward emits bias grads from VMEM instead of re-reading
        # the (B·L, D) grads from HBM) or adds them itself, in which case
        # XLA folds the add into the GEMM epilogue exactly as before.
        q, bq = _ProjIn(self.num_heads, head_dim, self.qkv_kernel_init,
                        self.use_bias, dtype, self.quant,
                        name="query")(inputs_q)
        k, bk = _ProjIn(self.num_heads, head_dim, self.qkv_kernel_init,
                        self.use_bias, dtype, self.quant,
                        name="key")(inputs_kv)
        v, bv = _ProjIn(self.num_heads, head_dim, self.qkv_kernel_init,
                        self.use_bias, dtype, self.quant,
                        name="value")(inputs_kv)

        y = multi_head_attention(
            q, k, v, self.num_heads, mask=mask, impl=self.attn_impl,
            seq_len=self.seq_len,
            qkv_biases=(bq, bk, bv) if self.use_bias else None)

        return _ProjOut(d_model, self.num_heads, head_dim,
                        self.out_kernel_init, self.use_bias,
                        dtype, self.quant, name="out")(y)


class _ProjIn(nn.Module):
    """Input projection to packed (batch, len, heads * head_dim).

    The parameter keeps the reference (d, H, hd) shape for checkpoint
    parity; it is reshaped (free) to (d, D) at use so the activation stays
    in the unpadded packed layout.

    Returns ``(y, bias)`` with the bias NOT added (``bias`` is None when
    `use_bias` is off): the attention core decides whether the add runs in
    its fused kernels (bias grads from VMEM) or inline (GEMM epilogue).
    """
    num_heads: int
    head_dim: int
    kernel_init: Callable
    use_bias: bool
    dtype: Dtype
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array):
        d_in = x.shape[-1]
        d_out = self.num_heads * self.head_dim
        kernel = self.param("kernel", self.kernel_init,
                            (d_in, self.num_heads, self.head_dim), jnp.float32)
        kernel2d = kernel.reshape(d_in, d_out)
        if self.quant:
            y = quant_dot(x.astype(self.dtype), kernel2d, quant=self.quant,
                          n_contract=1)
        else:
            y = jnp.dot(x.astype(self.dtype), kernel2d.astype(self.dtype))
        if not self.use_bias:
            return y, None
        bias = self.param("bias", nn.initializers.zeros,
                          (self.num_heads, self.head_dim), jnp.float32)
        return y, bias.reshape(d_out).astype(self.dtype)


class _ProjOut(nn.Module):
    """Output projection from packed (batch, len, D) to (..., d_model)."""
    d_model: int
    num_heads: int
    head_dim: int
    kernel_init: Callable
    use_bias: bool
    dtype: Dtype
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param("kernel", self.kernel_init,
                            (self.num_heads, self.head_dim, self.d_model),
                            jnp.float32)
        kernel2d = kernel.reshape(self.num_heads * self.head_dim,
                                  self.d_model)
        if self.quant:
            y = quant_dot(x.astype(self.dtype), kernel2d, quant=self.quant,
                          n_contract=1)
        else:
            y = jnp.dot(x.astype(self.dtype), kernel2d.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.d_model,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class QuantDense(nn.Module):
    """nn.Dense-compatible layer (same param names/shapes) with optional
    int8 forward matmul."""
    features: int
    kernel_init: Callable = nn.initializers.xavier_uniform()
    bias_init: Callable = nn.initializers.zeros
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dtype = self.dtype or x.dtype
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        if self.quant:
            y = quant_dot(x.astype(dtype), kernel, quant=self.quant)
        else:
            y = jnp.dot(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              jnp.float32)
            y = y + bias.astype(dtype)
        return y


class MlpBlock(nn.Module):
    """Transformer feed-forward block: Dense -> gelu -> Dense.

    gelu_approx=True (tanh approximation) matches the BigVision/CLIPA-v2
    towers and maps to a cheap fused VPU op; False (erf gelu) matches the
    open_clip default (`gelu_approximate: none`,
    clipa_torch/open_clip/model.py:50) needed for CLIPA-v1-style checkpoints.
    """

    mlp_dim: Optional[int] = None  # defaults to 4x model width
    dropout: float = 0.0
    fc_init: Callable = nn.initializers.xavier_uniform()
    proj_init: Callable = nn.initializers.xavier_uniform()
    dtype: Optional[Dtype] = None
    quant: Optional[str] = None
    # True = tanh-approx, False = erf, "quick" = x*sigmoid(1.702x)
    # (OpenAI CLIP's QuickGELU, clipa_torch/open_clip/transformer.py:78-82)
    gelu_approx: Any = True

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        d = x.shape[-1]
        dtype = self.dtype or x.dtype
        x = QuantDense(self.mlp_dim or 4 * d, kernel_init=self.fc_init,
                       dtype=dtype, quant=self.quant, name="Dense_0")(x)
        if self.gelu_approx == "quick":
            x = x * jax.nn.sigmoid(1.702 * x)
        else:
            x = nn.gelu(x, approximate=bool(self.gelu_approx))
        x = nn.Dropout(rate=self.dropout)(x, deterministic)
        x = QuantDense(d, kernel_init=self.proj_init, dtype=dtype,
                       quant=self.quant, name="Dense_1")(x)
        return x


class EncoderBlock(nn.Module):
    """Pre-LN transformer encoder block (MHSA + MLP), residual throughout."""

    num_heads: int
    mlp_dim: Optional[int] = None
    dropout: float = 0.0
    drop_path: float = 0.0
    attn_qkv_init: Callable = nn.initializers.xavier_uniform()
    attn_out_init: Callable = nn.initializers.xavier_uniform()
    mlp_fc_init: Callable = nn.initializers.xavier_uniform()
    mlp_proj_init: Callable = nn.initializers.xavier_uniform()
    dtype: Optional[Dtype] = None
    attn_impl: str = "auto"
    quant: Optional[str] = None
    gelu_approx: Any = True
    # flax/big_vision default 1e-6; torch/open_clip checkpoints use 1e-5.
    ln_eps: float = 1e-6
    # LayerScale (open_clip ResidualAttentionBlock ls_1/ls_2 when
    # vision_cfg.ls_init_value is set): per-branch learned (D,) gain,
    # applied before DropPath. None disables (no params created).
    ls_init: Optional[float] = None
    # Set when x is the flat (B*L, D) residual stream (see Encoder).
    seq_len: Optional[int] = None

    def _layer_scale(self, name: str, y: Array) -> Array:
        if self.ls_init is None:
            return y
        gamma = self.param(name, nn.initializers.constant(self.ls_init),
                           (y.shape[-1],), jnp.float32)
        return y * gamma.astype(y.dtype)

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True,
                 mask: Optional[Array] = None) -> Array:
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        y = MultiHeadAttention(
            num_heads=self.num_heads,
            qkv_kernel_init=self.attn_qkv_init,
            out_kernel_init=self.attn_out_init,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
            seq_len=self.seq_len,
            name="MultiHeadDotProductAttention_0")(y, y, mask=mask)
        y = self._layer_scale("ls1", y)
        y = nn.Dropout(rate=self.dropout)(y, deterministic)
        y = DropPath(rate=self.drop_path, seq_len=self.seq_len)(
            y, deterministic)
        x = x + y

        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        y = MlpBlock(mlp_dim=self.mlp_dim, dropout=self.dropout,
                     fc_init=self.mlp_fc_init, proj_init=self.mlp_proj_init,
                     dtype=self.dtype, quant=self.quant,
                     gelu_approx=self.gelu_approx,
                     name="MlpBlock_0")(y, deterministic)
        y = self._layer_scale("ls2", y)
        y = nn.Dropout(rate=self.dropout)(y, deterministic)
        y = DropPath(rate=self.drop_path, seq_len=self.seq_len)(
            y, deterministic)
        return x + y


class Encoder(nn.Module):
    """Stack of encoder blocks with optional activation rematerialization.

    Blocks are named ``encoderblock_{i}`` for checkpoint parity. Remat uses
    ``checkpoint_dots_with_no_batch_dims`` under policy "minimal" — the TPU
    sweet spot of recomputing elementwise work while keeping MXU outputs.
    """

    depth: int
    num_heads: int
    mlp_dim: Optional[int] = None
    dropout: float = 0.0
    drop_path: float = 0.0
    remat_policy: str = "none"
    block_init_fn: Optional[Callable[[int], dict]] = None
    dtype: Optional[Dtype] = None
    attn_impl: str = "auto"
    quant: Optional[str] = None
    gelu_approx: Any = True
    ln_eps: float = 1e-6
    ls_init: Optional[float] = None
    # "flat" (default) runs the residual stream as (B*L, D); "ref3d" keeps
    # the reference's (B, L, D) stream (clipa_jax/models/vit.py:164-183
    # shape) — used by bench.py's reference-equivalent baseline and as an
    # ablation switch for the layout-copy effect the flat stream removes.
    stream: str = "flat"

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True,
                 mask: Optional[Array] = None) -> Array:
        block_cls = EncoderBlock
        if self.remat_policy not in (None, "none"):
            policy = _remat_policy(self.remat_policy)
            block_cls = nn.remat(EncoderBlock, prevent_cse=True,
                                 policy=policy, static_argnums=(2,))

        # Unmasked encoders run the residual stream FLAT (B*L, D): every
        # block op is token-wise except attention (which takes seq_len), so
        # no 3D tensor exists between here and the exit reshape — XLA then
        # has no 3D intermediate to assign an L-major layout to, and the
        # Pallas attention boundary needs no transposing copies (~10 GB/step
        # at the flagship L/16@112 shape; r2's partial 2D attempt failed
        # precisely because the kernel still took 3D operands).
        seq = None
        if mask is None and x.ndim == 3 and self.stream == "flat":
            n, seq, d = x.shape
            x = x.reshape(n * seq, d)

        dpr = np.linspace(0.0, self.drop_path, self.depth)
        for i in range(self.depth):
            extra = self.block_init_fn(i) if self.block_init_fn else {}
            x = block_cls(
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                dropout=self.dropout,
                drop_path=float(dpr[i]),
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                quant=self.quant,
                gelu_approx=self.gelu_approx,
                ln_eps=self.ln_eps,
                ls_init=self.ls_init,
                seq_len=seq,
                name=f"encoderblock_{i}",
                **extra)(x, deterministic, mask)
        if seq is not None:
            x = x.reshape(n, seq, d)
        return x


def _remat_policy(name: str):
    if name == "minimal":
        return jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims
    return None
