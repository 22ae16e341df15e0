"""BigVGAN v2 vocoder (mel -> waveform), TPU-native.

Architecture parity with reference `s2mel/modules/bigvgan/bigvgan.py:243-384`:
conv_pre (k7) -> 6x [ConvTranspose1d upsample -> mean of 3 AMP residual
blocks] -> anti-aliased snake post-activation -> conv_post (k7) -> clamp.

Differences by design:
- weight norm is folded into plain conv weights at checkpoint conversion
  (the reference calls `remove_weight_norm()` before inference anyway,
  `infer_v2.py:157`);
- the up->snake->down anti-alias activation is one fused op
  (`voice_tts_tpu.ops.aa_snake_activation`): a Pallas kernel on TPU, the
  polyphase jnp path elsewhere — replacing the CUDA kernel at
  `alias_free_activation/cuda/anti_alias_activation_cuda.cu`.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from voice_tts_tpu.config import BigVGANConfig
from voice_tts_tpu.models.layers import Conv1d, ConvTranspose1d
from voice_tts_tpu.ops import aa_snake_activation


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class SnakeParams(nn.Module):
    """Per-channel snake(-beta) parameters, stored as in the checkpoint."""

    channels: int
    logscale: bool = True
    beta: bool = True  # snakebeta has independent magnitude params

    @nn.compact
    def __call__(self):
        init = nn.initializers.zeros if self.logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        beta = self.param("beta", init, (self.channels,)) if self.beta else alpha
        if self.logscale:
            alpha, beta = jnp.exp(alpha), jnp.exp(beta)
        return alpha, 1.0 / (beta + 1e-9)


class AMPBlock1(nn.Module):
    """Anti-aliased multi-periodicity residual block
    (reference `bigvgan.py:31-147`)."""

    channels: int
    kernel_size: int
    dilations: tuple
    snake_logscale: bool
    snake_beta: bool
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.dilations)
        convs1 = [Conv1d(self.channels, self.kernel_size, dilation=d,
                         padding=_get_padding(self.kernel_size, d), name=f"convs1_{i}")
                  for i, d in enumerate(self.dilations)]
        convs2 = [Conv1d(self.channels, self.kernel_size, dilation=1,
                         padding=_get_padding(self.kernel_size, 1), name=f"convs2_{i}")
                  for i in range(n)]
        snakes = [SnakeParams(self.channels, self.snake_logscale, self.snake_beta,
                              name=f"act_{i}")
                  for i in range(2 * n)]

        for i in range(n):
            a1, b1 = snakes[2 * i]()
            xt = aa_snake_activation(x, a1, b1, use_pallas=self.use_pallas)
            xt = convs1[i](xt)
            a2, b2 = snakes[2 * i + 1]()
            xt = aa_snake_activation(xt, a2, b2, use_pallas=self.use_pallas)
            xt = convs2[i](xt)
            x = xt + x
        return x


class BigVGAN(nn.Module):
    """mel (B, num_mels, F) -> waveform (B, 1, F * prod(upsample_rates))."""

    cfg: BigVGANConfig
    use_pallas: Optional[bool] = None
    # profiling aid: stop after the first `num_stages` upsample stages
    # (None = full model); output is then the intermediate activation
    num_stages: Optional[int] = None

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        num_kernels = len(cfg.resblock_kernel_sizes)
        snake_beta = cfg.activation == "snakebeta"

        x = Conv1d(cfg.upsample_initial_channel, 7, padding=3, name="conv_pre")(mel)

        ch = cfg.upsample_initial_channel
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            if self.num_stages is not None and i >= self.num_stages:
                return x
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = ConvTranspose1d(ch, k, stride=u, padding=(k - u) // 2,
                                name=f"ups_{i}")(x)
            xs = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
                out = AMPBlock1(ch, rk, tuple(rd), cfg.snake_logscale, snake_beta,
                                self.use_pallas,
                                name=f"resblocks_{i * num_kernels + j}")(x)
                xs = out if xs is None else xs + out
            x = xs / num_kernels

        a, b = SnakeParams(ch, cfg.snake_logscale, snake_beta,
                           name="activation_post")()
        x = aa_snake_activation(x, a, b, use_pallas=self.use_pallas)
        x = Conv1d(1, 7, padding=3, use_bias=cfg.use_bias_at_final,
                   name="conv_post")(x)
        if cfg.use_tanh_at_final:
            return jnp.tanh(x)
        return jnp.clip(x, -1.0, 1.0)
