"""Packed BigVGAN: the 3 parallel AMP resblocks of each stage as grouped convs.

Motivation (measured on v5e, scripts/profile_vocoder_stages.py): per-stage
cost is ~7 ms regardless of FLOPs (stage FLOPs halve every stage after the
second) — the vocoder is op-count-bound, not MXU-bound.  Each stage runs
3 resblocks x 3 dilation iterations x (2 convs + 2 anti-aliased snake
activations) = 36 convs + 18 activation pipelines of mostly-identical
shapes.

This module evaluates the 3 resblocks of a stage TOGETHER:

- their convolutions (same channel count, same dilation schedule, kernel
  sizes 3/7/11) become ONE grouped conv with `feature_group_count=3` after
  zero-padding every kernel to the largest size — exact: for odd k < K,
  centre-embedding the taps and using K's SAME padding reproduces the
  original output;
- their snake parameters stack channel-wise, so the up->snake->down
  anti-alias activation runs once on (B, 3C, T) instead of three times;
- the stage output is the mean over the 3 group slices (the reference's
  `xs / num_kernels`, `bigvgan.py:370-375`).

Op count per stage drops ~3x for identical arithmetic.  Parameters are
re-packed ON DEVICE from the canonical flax tree (`pack_bigvgan`, jitted) —
the checkpoint layout stays torch-compatible; snake exp/log-scale and
1/(beta+eps) are baked in at pack time.

Reference: `s2mel/modules/bigvgan/bigvgan.py:31-147,243-384`.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from voice_tts_tpu.config import BigVGANConfig
from voice_tts_tpu.ops import aa_snake_activation


def can_pack(cfg: BigVGANConfig) -> bool:
    """Packing requires odd kernels of equal parity and one shared dilation
    schedule across the parallel resblocks (true for every published BigVGAN
    config, including the reference `s2mel/modules/bigvgan/config.json`)."""
    ks = cfg.resblock_kernel_sizes
    ds = cfg.resblock_dilation_sizes
    return (all(k % 2 == 1 for k in ks)
            and all(tuple(d) == tuple(ds[0]) for d in ds)
            and len(ds) == len(ks))


def _snake_values(act: Dict[str, Any], logscale: bool, has_beta: bool):
    alpha = act["alpha"]
    beta = act["beta"] if has_beta else act["alpha"]
    if logscale:
        alpha, beta = jnp.exp(alpha), jnp.exp(beta)
    return alpha, 1.0 / (beta + 1e-9)


def _pad_kernel(w: jnp.ndarray, k_max: int) -> jnp.ndarray:
    """Centre-embed odd-k taps into an odd-k_max kernel (exact under SAME
    padding: the added taps are zero and the centre stays the centre)."""
    pad = (k_max - w.shape[-1]) // 2
    if pad == 0:
        return w
    return jnp.pad(w, ((0, 0), (0, 0), (pad, pad)))


@functools.partial(jax.jit, static_argnames=("cfg",))
def pack_bigvgan(params: Dict[str, Any], cfg: BigVGANConfig) -> Dict[str, Any]:
    """flax BigVGAN param tree -> packed tree for `bigvgan_packed_apply`."""
    p = params["params"]
    nk = len(cfg.resblock_kernel_sizes)
    k_max = max(cfg.resblock_kernel_sizes)
    n_iter = len(cfg.resblock_dilation_sizes[0])
    has_beta = cfg.activation == "snakebeta"

    out: Dict[str, Any] = {
        "conv_pre": p["conv_pre"],
        "conv_post": p["conv_post"],
    }
    a, br = _snake_values(p["activation_post"], cfg.snake_logscale, has_beta)
    out["act_post"] = (a, br)

    stages = []
    for i in range(len(cfg.upsample_rates)):
        blocks = [p[f"resblocks_{i * nk + j}"] for j in range(nk)]
        iters = []
        for m in range(n_iter):
            w1 = jnp.concatenate(
                [_pad_kernel(b[f"convs1_{m}"]["weight"], k_max) for b in blocks])
            b1 = jnp.concatenate([b[f"convs1_{m}"]["bias"] for b in blocks])
            w2 = jnp.concatenate(
                [_pad_kernel(b[f"convs2_{m}"]["weight"], k_max) for b in blocks])
            b2 = jnp.concatenate([b[f"convs2_{m}"]["bias"] for b in blocks])
            acts1 = [_snake_values(b[f"act_{2 * m}"], cfg.snake_logscale,
                                   has_beta) for b in blocks]
            acts2 = [_snake_values(b[f"act_{2 * m + 1}"], cfg.snake_logscale,
                                   has_beta) for b in blocks]
            a1 = jnp.concatenate([v[0] for v in acts1])
            br1 = jnp.concatenate([v[1] for v in acts1])
            a2 = jnp.concatenate([v[0] for v in acts2])
            br2 = jnp.concatenate([v[1] for v in acts2])
            iters.append({"w1": w1, "b1": b1, "w2": w2, "b2": b2,
                          "a1": a1, "br1": br1, "a2": a2, "br2": br2})
        stages.append({"ups": p[f"ups_{i}"], "iters": iters})
    out["stages"] = stages
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def pack_bigvgan_shared(params: Dict[str, Any],
                        cfg: BigVGANConfig) -> Dict[str, Any]:
    """flax BigVGAN param tree -> tree for `bigvgan_shared_act_apply`.

    Unlike `pack_bigvgan` (grouped convs, measured 2.7x SLOWER than the
    module path — XLA lowers feature-grouped 1D convs poorly on TPU), this
    variant only BATCHES THE ACTIVATIONS: snake params concatenate
    channel-wise so each anti-aliased activation runs once per dilation
    iteration on (B, nk*C, T), while the convolutions stay dense per-block
    at their ORIGINAL kernel sizes (no k_max zero-padding, no groups).

    Motivation (scripts/micro_vocoder_ops.py on v5e): the AA activation is
    ~0.16-0.31 ms/call nearly independent of shape — op-overhead-bound —
    and the module path makes 18 calls/stage (3 blocks x 3 iters x 2).
    Sharing cuts that to 6/stage for identical arithmetic.
    """
    p = params["params"]
    nk = len(cfg.resblock_kernel_sizes)
    n_iter = len(cfg.resblock_dilation_sizes[0])
    has_beta = cfg.activation == "snakebeta"

    out: Dict[str, Any] = {
        "conv_pre": p["conv_pre"],
        "conv_post": p["conv_post"],
    }
    a, br = _snake_values(p["activation_post"], cfg.snake_logscale, has_beta)
    out["act_post"] = (a, br)

    stages = []
    for i in range(len(cfg.upsample_rates)):
        blocks = [p[f"resblocks_{i * nk + j}"] for j in range(nk)]
        iters = []
        for m in range(n_iter):
            acts1 = [_snake_values(b[f"act_{2 * m}"], cfg.snake_logscale,
                                   has_beta) for b in blocks]
            acts2 = [_snake_values(b[f"act_{2 * m + 1}"], cfg.snake_logscale,
                                   has_beta) for b in blocks]
            iters.append({
                "convs1": [(b[f"convs1_{m}"]["weight"],
                            b[f"convs1_{m}"]["bias"]) for b in blocks],
                "convs2": [(b[f"convs2_{m}"]["weight"],
                            b[f"convs2_{m}"]["bias"]) for b in blocks],
                "a1": jnp.concatenate([v[0] for v in acts1]),
                "br1": jnp.concatenate([v[1] for v in acts1]),
                "a2": jnp.concatenate([v[0] for v in acts2]),
                "br2": jnp.concatenate([v[1] for v in acts2]),
            })
        stages.append({"ups": p[f"ups_{i}"], "iters": iters})
    out["stages"] = stages
    return out


def _conv(x, w, b, padding, dilation=1, groups=1):
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, window_strides=(1,),
        padding=[(padding, padding)], rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups)
    if b is not None:
        y = y + b[None, :, None]
    return y


def _conv_transpose(x, w, b, stride, padding):
    w_oik = jnp.flip(jnp.transpose(w, (1, 0, 2)), axis=-1)
    pad = w.shape[-1] - 1 - padding
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w_oik, window_strides=(1,),
        padding=[(pad, pad)], lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"))
    if b is not None:
        y = y + b[None, :, None]
    return y


def bigvgan_packed_apply(packed: Dict[str, Any], mel: jnp.ndarray,
                         cfg: BigVGANConfig, use_pallas=None) -> jnp.ndarray:
    """mel (B, num_mels, F) -> waveform (B, 1, F * prod(upsample_rates)).

    Produces bit-near-identical output to `BigVGAN.__call__` (same op
    order within each block; the only reassociation is none — the mean over
    blocks matches `xs / num_kernels`)."""
    nk = len(cfg.resblock_kernel_sizes)
    k_max = max(cfg.resblock_kernel_sizes)
    dilations = cfg.resblock_dilation_sizes[0]

    cp = packed["conv_pre"]
    x = _conv(mel, cp["weight"], cp["bias"], padding=3)

    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        st = packed["stages"][i]
        x = _conv_transpose(x, st["ups"]["weight"], st["ups"]["bias"],
                            stride=u, padding=(k - u) // 2)
        c = x.shape[1]
        xs = jnp.tile(x, (1, nk, 1))                     # (B, nk*C, T)
        for m, d in enumerate(dilations):
            it = st["iters"][m]
            xt = aa_snake_activation(xs, it["a1"], it["br1"],
                                     use_pallas=use_pallas)
            xt = _conv(xt, it["w1"], it["b1"],
                       padding=(k_max * d - d) // 2, dilation=d, groups=nk)
            xt = aa_snake_activation(xt, it["a2"], it["br2"],
                                     use_pallas=use_pallas)
            xt = _conv(xt, it["w2"], it["b2"],
                       padding=(k_max - 1) // 2, dilation=1, groups=nk)
            xs = xs + xt
        x = jnp.mean(xs.reshape(x.shape[0], nk, c, -1), axis=1)

    a, br = packed["act_post"]
    x = aa_snake_activation(x, a, br, use_pallas=use_pallas)
    cp = packed["conv_post"]
    x = _conv(x, cp["weight"], cp.get("bias"), padding=3)
    if cfg.use_tanh_at_final:
        return jnp.tanh(x)
    return jnp.clip(x, -1.0, 1.0)


def bigvgan_shared_act_apply(packed: Dict[str, Any], mel: jnp.ndarray,
                             cfg: BigVGANConfig,
                             use_pallas=None) -> jnp.ndarray:
    """mel (B, num_mels, F) -> waveform, same math as `BigVGAN.__call__`.

    The nk parallel resblocks' states ride one (B, nk*C, T) tensor so each
    anti-aliased snake activation is ONE call per dilation iteration; the
    convs run dense per block on channel slices (reference resblock
    semantics: `s2mel/modules/bigvgan/bigvgan.py:132-141,360-384`)."""
    nk = len(cfg.resblock_kernel_sizes)
    ks = cfg.resblock_kernel_sizes
    dilations = cfg.resblock_dilation_sizes[0]

    cp = packed["conv_pre"]
    x = _conv(mel, cp["weight"], cp["bias"], padding=3)

    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        st = packed["stages"][i]
        x = _conv_transpose(x, st["ups"]["weight"], st["ups"]["bias"],
                            stride=u, padding=(k - u) // 2)
        c = x.shape[1]
        xs = jnp.tile(x, (1, nk, 1))                     # (B, nk*C, T)
        for m, d in enumerate(dilations):
            it = st["iters"][m]
            z = aa_snake_activation(xs, it["a1"], it["br1"],
                                    use_pallas=use_pallas)
            xt = jnp.concatenate([
                _conv(z[:, j * c:(j + 1) * c], w, b,
                      padding=(ks[j] * d - d) // 2, dilation=d)
                for j, (w, b) in enumerate(it["convs1"])], axis=1)
            zt = aa_snake_activation(xt, it["a2"], it["br2"],
                                     use_pallas=use_pallas)
            xt = jnp.concatenate([
                _conv(zt[:, j * c:(j + 1) * c], w, b,
                      padding=(ks[j] - 1) // 2)
                for j, (w, b) in enumerate(it["convs2"])], axis=1)
            xs = xs + xt
        x = jnp.mean(xs.reshape(x.shape[0], nk, c, -1), axis=1)

    a, br = packed["act_post"]
    x = aa_snake_activation(x, a, br, use_pallas=use_pallas)
    cp = packed["conv_post"]
    x = _conv(x, cp["weight"], cp.get("bias"), padding=3)
    if cfg.use_tanh_at_final:
        return jnp.tanh(x)
    return jnp.clip(x, -1.0, 1.0)
