"""CAMPPlus speaker-style encoder (kaldi fbank -> 192-d x-vector).

Architecture parity with reference `s2mel/modules/campplus/{DTDNN,layers}.py`:
FCM 2D-conv front-end, D-TDNN blocks with context-aware masking (CAM),
transit layers, stats pooling, dense head.  Inference-only: batch norms are
applied with their running statistics.

TPU-native addition: an optional `valid_len` lets padded fixed-shape inputs
produce *exactly* the output the reference computes on the unpadded sequence.
Padding is re-zeroed after every nonlinearity (convs bleed otherwise), and
all pooling statistics (CAM context, segment pooling, stats pooling) count
valid frames only.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from voice_tts_tpu.config import CAMPPlusConfig
from voice_tts_tpu.models.layers import Conv1d


class BatchNormInference(nn.Module):
    """BatchNorm(1d/2d) in eval mode; channel axis = 1."""

    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[1]
        mean = self.param("running_mean", nn.initializers.zeros, (c,))
        var = self.param("running_var", nn.initializers.ones, (c,))
        shape = (1, c) + (1,) * (x.ndim - 2)
        y = (x - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + self.eps)
        if self.affine:
            w = self.param("weight", nn.initializers.ones, (c,))
            b = self.param("bias", nn.initializers.zeros, (c,))
            y = y * w.reshape(shape) + b.reshape(shape)
        return y


class Conv2dTorch(nn.Module):
    """torch.nn.Conv2d in (B, C, H, W); weight (O, I, kh, kw)."""

    features: int
    kernel: tuple
    stride: tuple = (1, 1)
    padding: tuple = (0, 0)
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (self.features, x.shape[1]) + tuple(self.kernel))
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=tuple(self.stride),
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))[None, :, None, None]
        return y


class BasicResBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, tmask) -> jnp.ndarray:
        in_planes = x.shape[1]
        out = Conv2dTorch(self.planes, (3, 3), (self.stride, 1), (1, 1),
                          name="conv1")(x)
        out = nn.relu(BatchNormInference(name="bn1")(out))
        out = out * tmask
        out = Conv2dTorch(self.planes, (3, 3), (1, 1), (1, 1), name="conv2")(out)
        out = BatchNormInference(name="bn2")(out)
        if self.stride != 1 or in_planes != self.planes:
            sc = Conv2dTorch(self.planes, (1, 1), (self.stride, 1), (0, 0),
                             name="shortcut_conv")(x)
            sc = BatchNormInference(name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc) * tmask


class FCM(nn.Module):
    m_channels: int = 32
    feat_dim: int = 80

    @nn.compact
    def __call__(self, x: jnp.ndarray, tmask1d) -> jnp.ndarray:
        # x (B, F, T); tmask1d (B, 1, T) or None
        tmask = 1.0 if tmask1d is None else tmask1d[:, :, None, :]
        x = x[:, None, :, :]
        x = Conv2dTorch(self.m_channels, (3, 3), (1, 1), (1, 1), name="conv1")(x)
        x = nn.relu(BatchNormInference(name="bn1")(x)) * tmask
        for li, strides in enumerate([[2, 1], [2, 1]]):
            for bi, s in enumerate(strides):
                x = BasicResBlock(self.m_channels, s,
                                  name=f"layer{li + 1}_{bi}")(x, tmask)
        x = Conv2dTorch(self.m_channels, (3, 3), (2, 1), (1, 1), name="conv2")(x)
        x = nn.relu(BatchNormInference(name="bn2")(x)) * tmask
        b, c, f, t = x.shape
        return x.reshape(b, c * f, t)


class CAMLayer(nn.Module):
    """Context-aware mask conv (reference `campplus/layers.py:71-110`)."""

    bn_channels: int
    out_channels: int
    kernel_size: int
    dilation: int
    reduction: int = 2
    seg_len: int = 100

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask, count) -> jnp.ndarray:
        pad = (self.kernel_size - 1) // 2 * self.dilation
        y = Conv1d(self.out_channels, self.kernel_size, padding=pad,
                   dilation=self.dilation, use_bias=False, name="linear_local")(x)
        if mask is None:
            context = jnp.mean(x, axis=-1, keepdims=True)
        else:
            context = jnp.sum(x, axis=-1, keepdims=True) / count[:, None, None]
        context = context + self._seg_pooling(x, count)
        context = nn.relu(Conv1d(self.bn_channels // self.reduction, 1,
                                 name="linear1")(context))
        m = nn.sigmoid(Conv1d(self.out_channels, 1, name="linear2")(context))
        out = y * m
        return out if mask is None else out * mask


    def _seg_pooling(self, x: jnp.ndarray, count) -> jnp.ndarray:
        b, c, t = x.shape
        seg = self.seg_len
        n = -(-t // seg)
        pad = n * seg - t
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        sums = xp.reshape(b, c, n, seg).sum(axis=-1)
        starts = jnp.arange(n) * seg
        if count is None:
            counts = jnp.minimum(seg, t - starts).astype(x.dtype)[None, :]
        else:
            counts = jnp.clip(
                jnp.minimum(seg, count[:, None] - starts[None, :]), 1, seg
            ).astype(x.dtype)
        avg = sums / counts[:, None, :]
        rep = jnp.repeat(avg, seg, axis=-1)
        return rep[..., :t]


class CAMDenseTDNNLayer(nn.Module):
    out_channels: int
    bn_channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask, count) -> jnp.ndarray:
        y = nn.relu(BatchNormInference(name="nonlinear1_bn")(x))
        if mask is not None:
            y = y * mask
        y = Conv1d(self.bn_channels, 1, use_bias=False, name="linear1")(y)
        y = nn.relu(BatchNormInference(name="nonlinear2_bn")(y))
        if mask is not None:
            y = y * mask
        return CAMLayer(self.bn_channels, self.out_channels, self.kernel_size,
                        self.dilation, name="cam_layer")(y, mask, count)


class CAMPPlus(nn.Module):
    """fbank (B, T, feat_dim) -> x-vector (B, embedding_size).

    `valid_len` (B,) enables the exact masked-padded path.
    """

    cfg: CAMPPlusConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 valid_len: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg
        t_in = x.shape[1]
        x = jnp.transpose(x, (0, 2, 1))  # (B, F, T)

        if valid_len is not None:
            tmask1d = (jnp.arange(t_in)[None, :] < valid_len[:, None])
            tmask1d = tmask1d[:, None, :].astype(x.dtype)  # (B,1,T)
            x = x * tmask1d
        else:
            tmask1d = None

        x = FCM(m_channels=32, feat_dim=cfg.feat_dim, name="head")(x, tmask1d)

        # tdnn: conv k5 stride 2 pad 2 -> bn-relu; time length (L-1)//2 + 1
        x = Conv1d(cfg.init_channels, 5, stride=2, padding=2, use_bias=False,
                   name="tdnn_linear")(x)
        x = nn.relu(BatchNormInference(name="tdnn_bn")(x))
        if valid_len is not None:
            count = (valid_len - 1) // 2 + 1
            mask = (jnp.arange(x.shape[-1])[None, :] < count[:, None])
            mask = mask[:, None, :].astype(x.dtype)
            x = x * mask
        else:
            count, mask = None, None

        channels = cfg.init_channels
        for i, (num_layers, kernel, dilation) in enumerate(
                zip((12, 24, 16), (3, 3, 3), (1, 2, 2))):
            for j in range(num_layers):
                y = CAMDenseTDNNLayer(cfg.growth_rate,
                                      cfg.bn_size * cfg.growth_rate,
                                      kernel, dilation,
                                      name=f"block{i + 1}_tdnnd{j + 1}")(x, mask, count)
                x = jnp.concatenate([x, y], axis=1)
            channels += num_layers * cfg.growth_rate
            x = nn.relu(BatchNormInference(name=f"transit{i + 1}_bn")(x))
            if mask is not None:
                x = x * mask
            x = Conv1d(channels // 2, 1, use_bias=False,
                       name=f"transit{i + 1}_linear")(x)
            channels //= 2

        x = nn.relu(BatchNormInference(name="out_bn")(x))

        # stats pooling: mean + unbiased std over valid frames
        if mask is not None:
            x = x * mask
            n = count[:, None].astype(x.dtype)
            mean = jnp.sum(x, axis=-1) / n
            var = jnp.sum(((x - mean[..., None]) * mask) ** 2, axis=-1) / (n - 1)
        else:
            t = x.shape[-1]
            mean = jnp.mean(x, axis=-1)
            var = jnp.sum((x - mean[..., None]) ** 2, axis=-1) / max(t - 1, 1)
        stats = jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)

        y = Conv1d(cfg.embedding_size, 1, use_bias=False,
                   name="dense_linear")(stats[..., None])
        y = BatchNormInference(affine=False, name="dense_bn")(y)
        return y[..., 0]
