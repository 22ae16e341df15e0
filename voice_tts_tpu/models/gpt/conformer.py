"""wenet-style conformer conditioning encoder.

Parity with reference `indextts/gpt/conformer_encoder.py` +
`indextts/gpt/conformer/{attention,embedding,subsampling}.py` as configured by
UnifiedVoice (`model_v2.py:352-376`): rel-pos multi-head attention *without*
rel-shift, GLU conv module (kernel 15, SiLU), no macaron FFN, pre-norm,
all five reference subsampling variants (`conformer_encoder.py:374-385` /
`conformer/subsampling.py:81-348`): linear (1x), conv2d2 (2x), conv2d (4x,
the reference signature default), conv2d6 (6x), conv2d8 (8x).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from voice_tts_tpu.config import ConformerConfig
from voice_tts_tpu.models.layers import Conv1d, LayerNorm, Linear


# Conv2dSubsampling{2,4,6,8} stage specs (reference `conformer/subsampling.py`):
# each stage is Conv2d(kernel, stride) + ReLU over (B, C, T, F); the time mask
# subsamples by [start::step] per stage exactly as the reference slices it.
_SUB_CONV_STAGES = {
    "conv2d2": ((3, 2),),                    # subsampling.py:135-186
    "conv2d": ((3, 2), (3, 2)),              # subsampling.py:189-242 (4x, default)
    "conv2d6": ((3, 2), (5, 3)),             # subsampling.py:245-293
    "conv2d8": ((3, 2), (3, 2), (3, 2)),     # subsampling.py:296-348
}
_SUB_MASK_SLICES = {
    "conv2d2": ((2, 2),),
    "conv2d": ((2, 2), (2, 2)),
    "conv2d6": ((2, 2), (4, 3)),
    "conv2d8": ((2, 2), (2, 2), (2, 2)),
}


def sinusoid_position_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Classic transformer PE table (1, max_len, d) matching
    `conformer/embedding.py:46-54`."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                      * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe[None]


class RelPositionAttention(nn.Module):
    """Transformer-XL style attention, rel-shift removed
    (reference `conformer/attention.py:189-313`)."""

    heads: int
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos_emb: jnp.ndarray,
                 mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        b, t, _ = x.shape
        h, dk = self.heads, self.dim // self.heads
        q = Linear(self.dim, name="linear_q")(x).reshape(b, t, h, dk)
        k = Linear(self.dim, name="linear_k")(x).reshape(b, t, h, dk)
        v = Linear(self.dim, name="linear_v")(x).reshape(b, t, h, dk)
        p = Linear(self.dim, use_bias=False, name="linear_pos")(pos_emb)
        p = p.reshape(1, -1, h, dk)

        bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, dk))
        bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, dk))

        ac = jnp.einsum("bihd,bjhd->bhij", q + bias_u, k,
                        precision=jax.lax.Precision.HIGHEST)
        bd = jnp.einsum("bihd,pjhd->bhij", q + bias_v, p,
                        precision=jax.lax.Precision.HIGHEST)
        scores = (ac + bd) / math.sqrt(dk)
        if mask is not None:
            # mask (B, 1, T): True = valid
            neg = jnp.finfo(scores.dtype).min
            scores = jnp.where(mask[:, None, :, :], scores, neg)
            probs = jax.nn.softmax(scores, axis=-1)
            probs = jnp.where(mask[:, None, :, :], probs, 0.0)
        else:
            probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", probs, v,
                         precision=jax.lax.Precision.HIGHEST)
        return Linear(self.dim, name="linear_out")(out.reshape(b, t, self.dim))


class ConvModule(nn.Module):
    """GLU conv module (reference `conformer_encoder.py:56-168`)."""

    dim: int
    kernel_size: int = 15

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # x (B, T, C)
        h = jnp.transpose(x, (0, 2, 1))
        if pad_mask is not None:
            h = h * pad_mask[:, None, :]
        h = Conv1d(2 * self.dim, 1, name="pointwise_conv1")(h)
        a, g = jnp.split(h, 2, axis=1)
        h = a * nn.sigmoid(g)
        h = Conv1d(self.dim, self.kernel_size, groups=self.dim,
                   padding=(self.kernel_size - 1) // 2, name="depthwise_conv")(h)
        h = jnp.transpose(h, (0, 2, 1))
        h = nn.swish(LayerNorm(name="norm")(h))
        h = jnp.transpose(h, (0, 2, 1))
        h = Conv1d(self.dim, 1, name="pointwise_conv2")(h)
        if pad_mask is not None:
            h = h * pad_mask[:, None, :]
        return jnp.transpose(h, (0, 2, 1))


class ConformerLayer(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pos_emb, mask, pad_mask):
        d = self.cfg.output_size
        r = x
        h = LayerNorm(name="norm_mha")(x)
        x = r + RelPositionAttention(self.cfg.attention_heads, d,
                                     name="self_attn")(h, pos_emb, mask)
        r = x
        h = LayerNorm(name="norm_conv")(x)
        x = r + ConvModule(d, self.cfg.cnn_module_kernel,
                           name="conv_module")(h, pad_mask)
        r = x
        h = LayerNorm(name="norm_ff")(x)
        h = Linear(self.cfg.linear_units, name="ff_w1")(h)
        h = nn.swish(h)
        h = Linear(d, name="ff_w2")(h)
        x = r + h
        return LayerNorm(name="norm_final")(x)


class ConformerEncoder(nn.Module):
    """(B, T, input_size) + lengths -> ((B, T', output_size), mask (B, 1, T'))."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        b, t, f = x.shape
        if lengths is None:
            lengths = jnp.full((b,), t, dtype=jnp.int32)
        mask = (jnp.arange(t)[None, :] < lengths[:, None])[:, None, :]  # (B,1,T)

        if cfg.input_layer in _SUB_CONV_STAGES:
            h = x[:, None, :, :]  # (B, 1, T, F)
            for i, (k, s) in enumerate(_SUB_CONV_STAGES[cfg.input_layer]):
                tag = "" if i == 0 else str(i)
                w = self.param(f"sub_conv{tag}_weight",
                               nn.initializers.lecun_normal(),
                               (cfg.output_size, h.shape[1], k, k))
                bconv = self.param(f"sub_conv{tag}_bias", nn.initializers.zeros,
                                   (cfg.output_size,))
                h = jax.lax.conv_general_dilated(
                    h, w, (s, s), [(0, 0), (0, 0)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW")
                ) + bconv[None, :, None, None]
                h = nn.relu(h)
                start, step = _SUB_MASK_SLICES[cfg.input_layer][i]
                mask = mask[:, :, start::step]
            bb, cc, tt, ff = h.shape
            h = jnp.transpose(h, (0, 2, 1, 3)).reshape(bb, tt, cc * ff)
            h = Linear(cfg.output_size, name="sub_out")(h)
        elif cfg.input_layer == "linear":
            # LinearNoSubsampling (`subsampling.py:35-78`): out.0 Linear +
            # out.1 LayerNorm — converter maps them to sub_out / sub_norm
            h = Linear(cfg.output_size, name="sub_out")(x)
            h = LayerNorm(name="sub_norm")(h)
        else:
            raise NotImplementedError(cfg.input_layer)

        tp = h.shape[1]
        pe = jnp.asarray(sinusoid_position_encoding(max(tp, 1), cfg.output_size))
        h = h * math.sqrt(cfg.output_size)
        pos_emb = pe[:, :tp]

        pad_mask = mask[:, 0, :].astype(h.dtype)
        for i in range(cfg.num_blocks):
            h = ConformerLayer(cfg, name=f"layer_{i}")(h, pos_emb, mask, pad_mask)
        h = LayerNorm(name="after_norm")(h)
        return h, mask
