"""w2v-bert-2.0 semantic encoder (facebook/w2v-bert-2.0) in JAX.

Parity with HF `Wav2Vec2BertModel` (conformer encoder,
`position_embeddings_type="relative_key"`), truncated at the hidden layer the
engine consumes: the reference takes `hidden_states[17]` — the output of
encoder layer index 16 — then normalizes with stored mean/std
(reference `infer_v2.py:201-210`, `utils/maskgct_utils.py:87-93`).  Only the
first `output_layer` layers are instantiated/computed: a 30% FLOP saving over
running all 24 layers like the reference does.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from voice_tts_tpu.config import W2VBertConfig
from voice_tts_tpu.models.layers import Conv1d, LayerNorm, Linear


class FeedForward(nn.Module):
    hidden: int
    intermediate: int

    @nn.compact
    def __call__(self, x):
        x = Linear(self.intermediate, name="intermediate_dense")(x)
        x = nn.swish(x)
        return Linear(self.hidden, name="output_dense")(x)


class ConvModule(nn.Module):
    hidden: int
    kernel_size: int

    @nn.compact
    def __call__(self, x, pad_mask: Optional[jnp.ndarray] = None):
        # x (B, T, C)
        x = LayerNorm(name="layer_norm")(x)
        if pad_mask is not None:
            x = x * pad_mask[..., None]
        h = jnp.transpose(x, (0, 2, 1))  # (B, C, T)
        h = Conv1d(2 * self.hidden, 1, use_bias=False, name="pointwise_conv1")(h)
        a, b = jnp.split(h, 2, axis=1)
        h = a * nn.sigmoid(b)  # GLU over channel dim
        # causal depthwise conv (left pad k-1)
        h = jnp.pad(h, ((0, 0), (0, 0), (self.kernel_size - 1, 0)))
        h = Conv1d(self.hidden, self.kernel_size, groups=self.hidden,
                   use_bias=False, name="depthwise_conv")(h)
        h = jnp.transpose(h, (0, 2, 1))
        h = LayerNorm(name="depthwise_layer_norm")(h)
        h = nn.swish(h)
        h = jnp.transpose(h, (0, 2, 1))
        h = Conv1d(self.hidden, 1, use_bias=False, name="pointwise_conv2")(h)
        return jnp.transpose(h, (0, 2, 1))


class SelfAttention(nn.Module):
    """relative_key attention: content scores + clamped-distance embedding."""

    hidden: int
    heads: int
    left_max: int
    right_max: int

    @nn.compact
    def __call__(self, x, attn_bias: Optional[jnp.ndarray] = None):
        b, t, _ = x.shape
        d = self.hidden // self.heads
        q = Linear(self.hidden, name="linear_q")(x).reshape(b, t, self.heads, d)
        k = Linear(self.hidden, name="linear_k")(x).reshape(b, t, self.heads, d)
        v = Linear(self.hidden, name="linear_v")(x).reshape(b, t, self.heads, d)

        scale = 1.0 / jnp.sqrt(d).astype(x.dtype)
        scores = jnp.einsum("bihd,bjhd->bhij", q, k,
                            precision=jax.lax.Precision.HIGHEST) * scale

        num_pos = self.left_max + self.right_max + 1
        dist_emb = self.param("distance_embedding",
                              nn.initializers.normal(0.02), (num_pos, d))
        pos = jnp.arange(t)
        distance = jnp.clip(pos[None, :] - pos[:, None],
                            -self.left_max, self.right_max) + self.left_max
        pos_emb = jnp.take(dist_emb, distance, axis=0)  # (T, T, d)
        rel = jnp.einsum("bihd,ijd->bhij", q, pos_emb,
                         precision=jax.lax.Precision.HIGHEST) * scale
        scores = scores + rel
        if attn_bias is not None:
            scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", probs, v,
                         precision=jax.lax.Precision.HIGHEST)
        return Linear(self.hidden, name="linear_out")(out.reshape(b, t, self.hidden))


class ConformerLayer(nn.Module):
    cfg: W2VBertConfig

    @nn.compact
    def __call__(self, x, attn_bias=None, pad_mask=None):
        c = self.cfg
        r = x
        h = LayerNorm(name="ffn1_layer_norm")(x)
        h = FeedForward(c.hidden_size, c.intermediate_size, name="ffn1")(h)
        x = h * 0.5 + r

        r = x
        h = LayerNorm(name="self_attn_layer_norm")(x)
        h = SelfAttention(c.hidden_size, c.num_heads,
                          c.left_max_position_embeddings,
                          c.right_max_position_embeddings, name="self_attn")(h, attn_bias)
        x = h + r

        r = x
        h = ConvModule(c.hidden_size, c.conv_kernel_size, name="conv_module")(x, pad_mask)
        x = r + h

        r = x
        h = LayerNorm(name="ffn2_layer_norm")(x)
        h = FeedForward(c.hidden_size, c.intermediate_size, name="ffn2")(h)
        x = h * 0.5 + r
        return LayerNorm(name="final_layer_norm")(x)


class Wav2Vec2Bert(nn.Module):
    """input_features (B, T, 160) -> hidden state of layer `output_layer`."""

    cfg: W2VBertConfig

    @nn.compact
    def __call__(self, features: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.cfg
        x = LayerNorm(name="fp_layer_norm")(features)
        x = Linear(c.hidden_size, name="fp_projection")(x)

        attn_bias = None
        pad_mask = None
        if attention_mask is not None:
            pad_mask = attention_mask.astype(x.dtype)
            x = x * pad_mask[..., None]
            attn_bias = (1.0 - pad_mask)[:, None, None, :] * jnp.finfo(x.dtype).min

        for i in range(c.output_layer):
            x = ConformerLayer(c, name=f"layer_{i}")(x, attn_bias, pad_mask)
        return x


def normalize_semantic(feat: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray):
    """(feat - mean) / std with the stored w2v-bert statistics."""
    return (feat - mean) / std
