"""Length regulator: semantic embeddings -> mel-rate condition.

Parity with reference `s2mel/modules/length_regulator.py:28-141` in its live
configuration (continuous input, no VQ, no f0): linear in-projection,
nearest-neighbour interpolation to the target length, conv/groupnorm/Mish
stacks, final 1x1 conv, length masking.

TPU-native: output length is a *static* bucket; the true source/target
lengths are dynamic scalars driving the nearest-neighbour gather and masks.
GroupNorm statistics are computed over valid positions only so the padded
graph matches the reference's exact-length math.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from voice_tts_tpu.config import LengthRegulatorConfig
from voice_tts_tpu.models.layers import Conv1d, Linear


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class MaskedGroupNorm(nn.Module):
    """torch.nn.GroupNorm over (B, C, T) with padding excluded from stats."""

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        b, c, t = x.shape
        g = self.num_groups
        m = mask[:, None, None, :]                       # (B,1,1,T)
        xg = x.reshape(b, g, c // g, t) * m
        count = jnp.sum(m, axis=(2, 3), keepdims=True) * (c // g)
        mean = jnp.sum(xg, axis=(2, 3), keepdims=True) / count
        var = jnp.sum(((xg - mean) * m) ** 2, axis=(2, 3), keepdims=True) / count
        y = ((xg - mean) * jax.lax.rsqrt(var + self.eps)).reshape(b, c, t)
        w = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return y * w[None, :, None] + bias[None, :, None]


class InterpolateRegulator(nn.Module):
    cfg: LengthRegulatorConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, src_len: jnp.ndarray,
                 target_len: jnp.ndarray, out_max: int) -> jnp.ndarray:
        """x (B, T_src_bucket, in_dim), dynamic src/target lengths ->
        (B, out_max, channels), zero beyond target_len."""
        cfg = self.cfg
        h = Linear(cfg.channels, name="content_in_proj")(x)  # (B, T, C)

        # nearest interpolation: out[j] = h[floor(j * src_len / target_len)]
        j = jnp.arange(out_max)
        idx = jnp.floor(j[None, :] * src_len[:, None] / target_len[:, None])
        idx = jnp.clip(idx.astype(jnp.int32), 0, x.shape[1] - 1)
        g = jnp.take_along_axis(h, idx[..., None], axis=1)  # (B, out_max, C)

        mask = (j[None, :] < target_len[:, None]).astype(h.dtype)  # (B, out_max)
        g = g * mask[..., None]

        y = jnp.transpose(g, (0, 2, 1))  # (B, C, T)
        for i in range(cfg.num_sampling_ratios):
            y = Conv1d(cfg.channels, 3, padding=1, name=f"conv_{i}")(y)
            y = MaskedGroupNorm(cfg.groups, name=f"norm_{i}")(y, mask)
            y = mish(y)
            # zero the padding so the next conv sees the reference's zero
            # boundary at target_len
            y = y * mask[:, None, :]
        y = Conv1d(cfg.channels, 1, name="conv_out")(y)
        return jnp.transpose(y, (0, 2, 1)) * mask[..., None]
