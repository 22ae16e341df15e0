"""WaveNet refinement head used by the DiT final layer.

Parity with reference `s2mel/modules/wavenet.py:103-174` + the encodec
`SConv1d` padding behaviour (`encodec.py:192-229`): stride-1 odd-kernel convs
are symmetrically *reflect*-padded; weight norm is folded at conversion.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from voice_tts_tpu.config import WaveNetConfig
from voice_tts_tpu.models.layers import Conv1d


class ReflectConv1d(nn.Module):
    """SConv1d equivalent for stride-1 use: reflect pad then valid conv."""

    features: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel_size - 1) * self.dilation
        left = pad - pad // 2
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (left, pad // 2)), mode="reflect")
        return Conv1d(self.features, self.kernel_size, dilation=self.dilation,
                      name="conv")(x)


def reflect_fill(x: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """Emulate exact-length reflect padding inside a static buffer.

    x (B, C, T) with valid prefix `lens` (B,): positions past lens-1 are
    replaced by the mirror image around the LAST VALID frame (x[lens-2],
    x[lens-3], ...), which is what an exact-length run's right-edge reflect
    pad would see.  Without this, a conv at the tail of the valid region
    reads zeros/garbage from the pad instead of the reflected values, and
    bucketed outputs drift from exact-length outputs near the boundary.
    """
    t = x.shape[-1]
    p = jnp.arange(t)[None, :]
    idx = jnp.where(p < lens[:, None], p, 2 * lens[:, None] - 2 - p)
    idx = jnp.clip(idx, 0, t - 1)
    return jnp.take_along_axis(x, idx[:, None, :], axis=2)


class WN(nn.Module):
    """Gated dilated conv stack: x (B, C, T), mask (B, 1, T), g (B, gin, 1).

    `x_lens` (B,), when given, makes each k>1 conv see exact-length reflect
    boundary semantics at the dynamic valid-length boundary (see
    `reflect_fill`); required for parity when T is a padded bucket.
    """

    cfg: WaveNetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray,
                 g: Optional[jnp.ndarray] = None,
                 x_lens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.cfg
        h = c.hidden_dim
        output = jnp.zeros_like(x)
        if g is not None:
            g_all = ReflectConv1d(2 * h * c.num_layers, 1, name="cond_layer")(g)
        for i in range(c.num_layers):
            dilation = c.dilation_rate ** i
            x_conv_in = reflect_fill(x, x_lens) if x_lens is not None else x
            x_in = ReflectConv1d(2 * h, c.kernel_size, dilation,
                                 name=f"in_layer_{i}")(x_conv_in)
            if g is not None:
                g_l = jax.lax.dynamic_slice_in_dim(g_all, i * 2 * h, 2 * h, axis=1)
            else:
                g_l = jnp.zeros_like(x_in)
            acts = x_in + g_l
            t_act = jnp.tanh(acts[:, :h])
            s_act = nn.sigmoid(acts[:, h:])
            acts = t_act * s_act
            res_skip_ch = 2 * h if i < c.num_layers - 1 else h
            res_skip = ReflectConv1d(res_skip_ch, 1, name=f"res_skip_{i}")(acts)
            if i < c.num_layers - 1:
                x = (x + res_skip[:, :h]) * x_mask
                output = output + res_skip[:, h:]
            else:
                output = output + res_skip
        return output * x_mask
