"""Qwen-architecture causal LM for text->emotion classification.

The reference drives a Qwen chat model through HF generate to classify text
into the 8 canonical emotions (`infer_v2.py:795-906`, `QwenEmotion`).  This is
the JAX equivalent: llama-family decoder (RMSNorm, interleaved-pair-free
half-rotation RoPE, GQA, SwiGLU) with a fixed-shape greedy decode loop and a
converter from HF Qwen2/Qwen3 state dicts.  Supports both Qwen2 (qkv bias)
and Qwen3 (per-head q/k RMSNorm) variants.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from voice_tts_tpu.models.layers import Embedding, Linear, RMSNorm


class QwenArch(NamedTuple):
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    rope_theta: float = 1000000.0
    rms_eps: float = 1e-6
    qkv_bias: bool = True      # Qwen2 style
    qk_norm: bool = False      # Qwen3 style
    tie_embeddings: bool = True


def _rope_half(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """HF llama-style rotation: rotate_half (first/second half split)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


def rope_tables(positions: jnp.ndarray, head_dim: int, theta: float):
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2) / head_dim))
    angles = positions[..., None] * inv[None, :]          # (T, D/2)
    emb = jnp.concatenate([angles, angles], axis=-1)      # (T, D)
    return jnp.cos(emb), jnp.sin(emb)


class QwenBlock(nn.Module):
    arch: QwenArch

    @nn.compact
    def __call__(self, x, cos, sin, kv, cache_index, attn_mask):
        a = self.arch
        b, s, _ = x.shape
        h, kvh, hd = a.num_heads, a.num_kv_heads, a.head_dim

        y = RMSNorm(eps=a.rms_eps, name="input_layernorm")(x)
        q = Linear(h * hd, use_bias=a.qkv_bias, name="q_proj")(y)
        k = Linear(kvh * hd, use_bias=a.qkv_bias, name="k_proj")(y)
        v = Linear(kvh * hd, use_bias=a.qkv_bias, name="v_proj")(y)
        q = q.reshape(b, s, h, hd)
        k = k.reshape(b, s, kvh, hd)
        v = v.reshape(b, s, kvh, hd)
        if a.qk_norm:
            q = RMSNorm(eps=a.rms_eps, name="q_norm")(q)
            k = RMSNorm(eps=a.rms_eps, name="k_norm")(k)
        q = _rope_half(q, cos[:, :, None, :], sin[:, :, None, :])
        k = _rope_half(k, cos[:, :, None, :], sin[:, :, None, :])

        q = jnp.transpose(q, (0, 2, 1, 3))
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))
        if kv is not None:
            k_cache = jax.lax.dynamic_update_slice(kv[0], k, (0, 0, cache_index, 0))
            v_cache = jax.lax.dynamic_update_slice(kv[1], v, (0, 0, cache_index, 0))
            new_kv = jnp.stack([k_cache, v_cache])
            k_all, v_all = k_cache, v_cache
        else:
            new_kv = None
            k_all, v_all = k, v
        rep = h // kvh
        k_all = jnp.repeat(k_all, rep, axis=1)
        v_all = jnp.repeat(v_all, rep, axis=1)

        scores = jnp.einsum("bhsd,bhld->bhsl", q, k_all) / jnp.sqrt(
            jnp.asarray(hd, x.dtype))
        scores = jnp.where(attn_mask[:, None, :, :], scores,
                           jnp.finfo(scores.dtype).min)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhsl,bhld->bhsd", probs, v_all)
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(b, s, h * hd)
        x = x + Linear(a.hidden_size, use_bias=False, name="o_proj")(ctx)

        y = RMSNorm(eps=a.rms_eps, name="post_attention_layernorm")(x)
        gate = nn.silu(Linear(a.intermediate_size, use_bias=False,
                              name="gate_proj")(y))
        up = Linear(a.intermediate_size, use_bias=False, name="up_proj")(y)
        x = x + Linear(a.hidden_size, use_bias=False,
                       name="down_proj")(gate * up)
        return x, new_kv


class QwenLM(nn.Module):
    arch: QwenArch

    @nn.compact
    def __call__(self, tokens: jnp.ndarray,
                 kv_cache: Optional[jnp.ndarray] = None,
                 cache_index=0,
                 valid_mask: Optional[jnp.ndarray] = None):
        a = self.arch
        b, s = tokens.shape
        embed = Embedding(a.vocab_size, a.hidden_size, name="embed_tokens")
        x = embed(tokens)

        positions = cache_index + jnp.arange(s)
        cos, sin = rope_tables(positions, a.head_dim, a.rope_theta)
        cos, sin = cos[None], sin[None]

        if kv_cache is not None:
            t_max = kv_cache.shape[4]
            pos = jnp.arange(t_max)[None, None, :]
            q_pos = cache_index + jnp.arange(s)[None, :, None]
            mask = jnp.broadcast_to(pos <= q_pos, (b, s, t_max))
        else:
            mask = jnp.broadcast_to(
                jnp.tril(jnp.ones((s, s), dtype=bool))[None], (b, s, s))
        if valid_mask is not None:
            mask = mask & valid_mask[:, None, :mask.shape[-1]]

        new_layers = []
        for i in range(a.num_layers):
            kv = None if kv_cache is None else kv_cache[i]
            x, new_kv = QwenBlock(a, name=f"layer_{i}")(x, cos, sin, kv,
                                                        cache_index, mask)
            if new_kv is not None:
                new_layers.append(new_kv)
        x = RMSNorm(eps=a.rms_eps, name="norm")(x)
        if a.tie_embeddings:
            table = self.get_variable("params", "embed_tokens")["weight"]
            logits = x @ table.T
        else:
            logits = Linear(a.vocab_size, use_bias=False, name="lm_head")(x)
        new_cache = jnp.stack(new_layers) if new_layers else None
        return logits, new_cache


@functools.partial(jax.jit, static_argnames=("model", "max_new", "eos_id"))
def qwen_greedy_decode(params, model: QwenLM, tokens: jnp.ndarray,
                       prompt_len: jnp.ndarray, max_new: int,
                       eos_id: int) -> jnp.ndarray:
    """tokens (1, P_bucket) *left-padded* (real tokens right-aligned); greedy
    decode up to max_new.  A uniform RoPE position shift from left padding is
    harmless (scores depend on relative positions only).

    Returns (1, max_new) generated ids, eos-padded.
    """
    a = model.arch
    b, pb = tokens.shape
    t_max = pb + max_new
    cache = jnp.zeros((a.num_layers, 2, b, a.num_kv_heads, t_max, a.head_dim),
                      dtype=jnp.float32)
    valid = jnp.concatenate(
        [jnp.arange(pb)[None, :] >= (pb - prompt_len)[:, None],
         jnp.ones((b, max_new), dtype=bool)], axis=1)

    logits, cache = model.apply(params, tokens, cache, 0, valid)
    token0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

    out0 = jnp.full((b, max_new), eos_id, dtype=jnp.int32)
    out0 = out0.at[:, 0].set(token0)

    def cond(state):
        i, token, cache, out, done = state
        return (i < max_new) & ~jnp.all(done)

    def body(state):
        i, token, cache, out, done = state
        logits, cache = model.apply(params, token[:, None], cache, pb + i - 1,
                                    valid)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos_id, nxt)
        out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, i))
        return i + 1, nxt, cache, out, done | (nxt == eos_id)

    state = (jnp.asarray(1), token0, cache, out0, token0 == eos_id)
    _, _, _, out, _ = jax.lax.while_loop(cond, body, state)
    return out
