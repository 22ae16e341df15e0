"""GPT-2 transformer stack with preallocated KV cache.

Architecture parity with the vendored HF GPT-2 used by UnifiedVoice
(reference `indextts/gpt/transformers_gpt2.py`: pre-LN blocks, fused-qkv
Conv1D projections, gelu_new MLP, final ln_f; positional embeddings are
external).  TPU-native decode: one module handles both prefill and
single-token steps against a fixed-shape cache, so the whole AR loop stays
inside `lax.while_loop` with static shapes.

Cache layout: (layers, 2, B, heads, head_dim, max_len) — time on the minor
(lane) axis, so cache tiles stay dense for any head_dim and a future Pallas
decode-attention kernel can DMA contiguous [0, pos] spans.  (Measured equal
to the time-major layout under XLA on v5e; kept for the kernel roadmap.)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from voice_tts_tpu.models.layers import LayerNorm


class QuantKVCache(NamedTuple):
    """int8 KV cache for the batched XLA decode path.

    Per-(layer, k/v, batch, head, position) symmetric scales: dequant is
    `int8 * scale`.  Halves the dominant HBM traffic of batched decode
    (weights amortize across the batch; the cache doesn't — measured the
    top term at batch >= 8, STATUS.md).  The scale factors fold into the
    attention *outputs* (scores/probs), so the int8 -> bf16 convert fuses
    into the dot operands and the dequantized cache is never materialized.
    """

    kv: jnp.ndarray      # (L, 2, B, H, hd, Tmax) int8
    scales: jnp.ndarray  # (L, 2, B, H, Tmax) f32


def _quantize_kv(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """t (B, H, hd, S) float -> (int8 rows, scales (B, H, S) f32)."""
    s = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=2) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.round(t.astype(jnp.float32) / s[:, :, None, :])
    return jnp.clip(q, -127, 127).astype(jnp.int8), s


class Conv1DGPT(nn.Module):
    """HF GPT-2 'Conv1D': y = x @ W + b with W stored (in, out).

    Supports int8 weight-only decode: when the param tree carries a sibling
    `scale` (see `voice_tts_tpu.utils.quantize`), W is int8 and the
    dequantizing convert fuses into the dot operand, halving the HBM read.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.normal(0.02),
                       (x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.is_initializing() or not self.has_variable("params", "scale"):
            return x @ w + b
        scale = self.get_variable("params", "scale")
        if x.ndim == 3 and x.shape[0] * x.shape[1] <= 32:
            # decode-sized activations: fused Pallas int8 GEMV (dequant in
            # VMEM; XLA materializes the convert and loses the byte savings)
            from voice_tts_tpu.ops.int8_matmul import int8_gemv

            bsz, s, din = x.shape
            interp = jax.default_backend() != "tpu"
            y = int8_gemv(x.reshape(bsz * s, din), w,
                          scale.astype(jnp.float32), interpret=interp)
            return y.reshape(bsz, s, self.features) + b
        # prefill/batch-sized: dequantize to bf16, not x.dtype — halves the
        # convert+dot HBM traffic and runs the MXU at bf16 rate; the f32
        # scale multiply restores the magnitude, output back in x.dtype
        y = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return (y * scale.astype(jnp.float32) + b).astype(x.dtype)


class GPT2Block(nn.Module):
    dim: int
    heads: int
    pallas_attention: bool = False

    @nn.compact
    def __call__(self, x, kv, cache_index, attn_mask):
        """x (B,S,D); kv (2,B,H,hd,Tmax) or None; attn_mask (B,S,L) bool.

        Returns (hidden, new_kv).  Without a cache, L == S (plain causal
        forward).  With a cache, K/V of the current block are written at
        positions [cache_index, cache_index+S) and attention spans the whole
        cache (L == Tmax).
        """
        b, s, d = x.shape
        h, hd = self.heads, self.dim // self.heads

        res = x
        y = LayerNorm(name="ln_1")(x)
        qkv = Conv1DGPT(3 * d, name="attn_c_attn")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        q = jnp.transpose(q.reshape(b, s, h, hd), (0, 2, 1, 3))  # (B,H,S,hd)

        def heads_time_minor(t):  # (B,H,hd,S)
            return jnp.transpose(t.reshape(b, s, h, hd), (0, 2, 3, 1))
        k, v = heads_time_minor(k), heads_time_minor(v)

        int8_kv = isinstance(kv, tuple)
        k_scale = v_scale = None
        if int8_kv:
            kv_q, kv_s = kv                      # (2,B,H,hd,T) i8, (2,B,H,T)
            k_q, k_s = _quantize_kv(k)
            v_q, v_s = _quantize_kv(v)
            k_cache = jax.lax.dynamic_update_slice(kv_q[0], k_q,
                                                   (0, 0, 0, cache_index))
            v_cache = jax.lax.dynamic_update_slice(kv_q[1], v_q,
                                                   (0, 0, 0, cache_index))
            s_cache = jax.lax.dynamic_update_slice(
                kv_s, jnp.stack([k_s, v_s]), (0, 0, 0, cache_index))
            new_kv = (jnp.stack([k_cache, v_cache]), s_cache)
            k_all, v_all = k_cache, v_cache
            k_scale, v_scale = s_cache[0], s_cache[1]   # (B,H,T)
        elif kv is not None:
            k_cache = jax.lax.dynamic_update_slice(kv[0], k,
                                                   (0, 0, 0, cache_index))
            v_cache = jax.lax.dynamic_update_slice(kv[1], v,
                                                   (0, 0, 0, cache_index))
            new_kv = jnp.stack([k_cache, v_cache])
            k_all, v_all = k_cache, v_cache
        else:
            new_kv = None
            k_all, v_all = k, v

        if (self.pallas_attention and kv is not None and not int8_kv
                and s == 1 and not self.is_initializing()
                and k_all.shape[3] % 512 == 0):
            # bounded-read Pallas decode attention: DMAs only [0, pos]
            from voice_tts_tpu.ops.decode_attention import decode_attention

            bias = jnp.where(attn_mask[:, 0, :], 0.0, -1e30).astype(jnp.float32)
            interp = jax.default_backend() != "tpu"
            ctx = decode_attention(q[:, :, 0, :], k_all, v_all, bias,
                                   cache_index + 1, interpret=interp)
            ctx = ctx.reshape(b, s, d)
        else:
            # fp32 scores/softmax regardless of (possibly bf16) compute dtype
            k_dot = k_all.astype(q.dtype) if int8_kv else k_all
            scores = jnp.einsum("bhsd,bhdl->bhsl", q, k_dot,
                                preferred_element_type=jnp.float32)
            if int8_kv:
                # per-position dequant rides on the scores (varies only
                # along l), so the int8->dtype convert fuses into the dot
                scores = scores * k_scale[:, :, None, :]
            scores = scores / jnp.sqrt(jnp.asarray(hd, dtype=jnp.float32))
            neg = jnp.finfo(scores.dtype).min
            scores = jnp.where(attn_mask[:, None, :, :], scores, neg)
            probs = jax.nn.softmax(scores, axis=-1)
            if int8_kv:
                # v dequant folds into probs the same way
                probs = (probs * v_scale[:, :, None, :]).astype(q.dtype)
                ctx = jnp.einsum("bhsl,bhdl->bhsd", probs,
                                 v_all.astype(q.dtype))
            else:
                probs = probs.astype(v_all.dtype)
                ctx = jnp.einsum("bhsl,bhdl->bhsd", probs, v_all)
            ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(b, s, d)
        x = res + Conv1DGPT(d, name="attn_c_proj")(ctx)

        res = x
        y = LayerNorm(name="ln_2")(x)
        y = Conv1DGPT(4 * d, name="mlp_c_fc")(y)
        y = nn.gelu(y, approximate=True)  # gelu_new
        y = Conv1DGPT(d, name="mlp_c_proj")(y)
        return res + y, new_kv


class GPT2Stack(nn.Module):
    layers: int
    dim: int
    heads: int
    pallas_attention: bool = False

    @nn.compact
    def __call__(self, embeds: jnp.ndarray,
                 kv_cache: Optional[jnp.ndarray] = None,
                 cache_index: int | jnp.ndarray = 0,
                 valid_mask: Optional[jnp.ndarray] = None,
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """embeds (B, S, D) -> (hidden (B, S, D), new_cache).

        valid_mask (B, L) bool: attendable key positions (False for padding).
        GPT positions carry no absolute embedding here (the reference nulls
        wpe, `model_v2.py:272-274`), so causal attention + a validity mask is
        exactly equivalent to the reference's left-padded batching.
        """
        b, s, d = embeds.shape
        int8_kv = isinstance(kv_cache, (tuple, QuantKVCache))
        if int8_kv:
            kv_cache = QuantKVCache(*kv_cache)
        if kv_cache is not None:
            t_max = (kv_cache.kv if int8_kv else kv_cache).shape[5]
            pos = jnp.arange(t_max)[None, None, :]
            q_pos = cache_index + jnp.arange(s)[None, :, None]
            mask = jnp.broadcast_to(pos <= q_pos, (b, s, t_max))
        else:
            t_max = s
            mask = jnp.broadcast_to(jnp.tril(jnp.ones((s, s), dtype=bool))[None],
                                    (b, s, s))
        if valid_mask is not None:
            mask = mask & valid_mask[:, None, :t_max]

        x = embeds
        new_layers = []
        for i in range(self.layers):
            if kv_cache is None:
                kv = None
            elif int8_kv:
                kv = (kv_cache.kv[i], kv_cache.scales[i])
            else:
                kv = kv_cache[i]
            x, new_kv = GPT2Block(d, self.heads, self.pallas_attention,
                                  name=f"h_{i}")(x, kv, cache_index, mask)
            if new_kv is not None:
                new_layers.append(new_kv)
        x = LayerNorm(name="ln_f")(x)
        if not new_layers:
            new_cache = None
        elif int8_kv:
            new_cache = QuantKVCache(
                jnp.stack([kv for kv, _ in new_layers]),
                jnp.stack([s for _, s in new_layers]))
        else:
            new_cache = jnp.stack(new_layers)
        return x, new_cache

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32) -> jnp.ndarray:
        hd = self.dim // self.heads
        return jnp.zeros((self.layers, 2, batch, self.heads, hd, max_len),
                         dtype=dtype)

    def init_quant_cache(self, batch: int, max_len: int) -> QuantKVCache:
        hd = self.dim // self.heads
        return QuantKVCache(
            jnp.zeros((self.layers, 2, batch, self.heads, hd, max_len),
                      dtype=jnp.int8),
            jnp.full((self.layers, 2, batch, self.heads, max_len), 1e-12,
                     dtype=jnp.float32))
