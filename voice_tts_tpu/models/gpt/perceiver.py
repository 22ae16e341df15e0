"""Perceiver resampler: variable-length conditioning -> fixed latent set.

Parity with reference `indextts/gpt/perceiver.py:224-281` (naturalspeech2
lineage): learned latents cross-attend to [latents; projected context]
(`cross_attn_include_queries=True`), GEGLU feed-forward, final RMSNorm with
sqrt(dim) scale.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from voice_tts_tpu.models.layers import Linear


class PerceiverRMSNorm(nn.Module):
    """F.normalize(x) * sqrt(dim) * gamma (reference `perceiver.py:166-186`)."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (dim,))
        normed = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return normed * math.sqrt(dim) * gamma


class PerceiverAttention(nn.Module):
    dim: int
    heads: int
    dim_head: int = 64

    @nn.compact
    def __call__(self, latents, context, mask: Optional[jnp.ndarray]):
        b, n, _ = latents.shape
        inner = self.heads * self.dim_head
        q = Linear(inner, use_bias=False, name="to_q")(latents)
        kv = Linear(inner * 2, use_bias=False, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)

        def split(x):
            return jnp.transpose(x.reshape(b, -1, self.heads, self.dim_head),
                                 (0, 2, 1, 3))
        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhid,bhjd->bhij", q, k,
                            precision=jax.lax.Precision.HIGHEST)
        scores = scores * (self.dim_head ** -0.5)
        if mask is not None:
            neg = jnp.finfo(scores.dtype).max
            scores = jnp.where(mask[:, None, None, :], scores, -neg)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", probs, v,
                         precision=jax.lax.Precision.HIGHEST)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, inner)
        return Linear(self.dim, use_bias=False, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult * 2 / 3)
        h = Linear(inner * 2, name="proj_in")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        h = nn.gelu(gate, approximate=False) * a
        return Linear(self.dim, name="proj_out")(h)


class PerceiverResampler(nn.Module):
    dim: int
    dim_context: int
    num_latents: int
    heads: int = 8
    depth: int = 2
    ff_mult: int = 4
    dim_head: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x (B, T, dim_context), mask (B, num_latents + T) -> (B, latents, dim)."""
        b = x.shape[0]
        if self.dim_context != self.dim:
            x = Linear(self.dim, name="proj_context")(x)
        latents = self.param("latents", nn.initializers.normal(0.02),
                             (self.num_latents, self.dim))
        latents = jnp.broadcast_to(latents[None], (b,) + latents.shape)
        for i in range(self.depth):
            context = jnp.concatenate([latents, x], axis=-2)
            latents = PerceiverAttention(self.dim, self.heads, self.dim_head,
                                         name=f"attn_{i}")(latents, context, mask) + latents
            latents = GEGLUFeedForward(self.dim, self.ff_mult,
                                       name=f"ff_{i}")(latents) + latents
        return PerceiverRMSNorm(name="norm")(latents)
