"""Shared NN layers with torch-checkpoint-compatible parameter layouts.

Convolutions operate in (B, C, T) with weights stored exactly as the torch
state dicts ship them — Conv1d: (out, in/groups, k); ConvTranspose1d:
(in, out/groups, k) — so the checkpoint converter is a rename, not a
transpose maze.  XLA picks TPU-friendly internal layouts regardless.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class Conv1d(nn.Module):
    """torch.nn.Conv1d-equivalent in (B, C, T) layout."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[1]
        w = self.param(
            "weight", nn.initializers.lecun_normal(),
            (self.features, in_ch // self.groups, self.kernel_size))
        # compute dtype follows the params (bf16 runtime trees); lax.conv
        # requires lhs/rhs dtypes to match
        y = jax.lax.conv_general_dilated(
            x.astype(w.dtype), w,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b[None, :, None]
        return y


class ConvTranspose1d(nn.Module):
    """torch.nn.ConvTranspose1d-equivalent in (B, C, T) layout.

    out_len = (in_len - 1) * stride - 2 * padding + kernel_size.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[1]
        w = self.param(
            "weight", nn.initializers.lecun_normal(),
            (in_ch, self.features, self.kernel_size))  # torch layout (I, O, K)
        # conv_transpose == lhs-dilated conv with the spatially flipped kernel
        w_oik = jnp.flip(jnp.transpose(w, (1, 0, 2)), axis=-1)
        pad = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(w.dtype), w_oik,
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b[None, :, None]
        return y


class Linear(nn.Module):
    """torch.nn.Linear-equivalent: weight stored (out, in)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (self.features, x.shape[-1]))
        y = x @ w.T
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


class LayerNorm(nn.Module):
    """torch.nn.LayerNorm over the last dim."""

    eps: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        xf = x.astype(jnp.float32)  # fp32 statistics under bf16 compute
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        if self.use_scale:
            y = y * self.param("weight", nn.initializers.ones, (dim,))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (dim,))
        return y


class GroupNorm(nn.Module):
    """torch.nn.GroupNorm over (B, C, T)."""

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, c, t = x.shape
        g = self.num_groups
        xg = x.reshape(b, g, c // g, t)
        mean = jnp.mean(xg, axis=(2, 3), keepdims=True)
        var = jnp.mean((xg - mean) ** 2, axis=(2, 3), keepdims=True)
        y = ((xg - mean) * jax.lax.rsqrt(var + self.eps)).reshape(b, c, t)
        w = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return y * w[None, :, None] + bias[None, :, None]


class Embedding(nn.Module):
    """torch.nn.Embedding-equivalent."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param("weight", nn.initializers.normal(0.02),
                           (self.num_embeddings, self.features))
        return jnp.take(table, ids, axis=0)


class RMSNorm(nn.Module):
    """llama-style RMSNorm (reference `gpt_fast/model.py:322-333`)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (dim,))
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (normed.astype(x.dtype)) * w
