"""Fused BigVGAN resblock-stage Pallas kernel (late-stage op-count fix).

Measured on v5e (scripts/profile_vocoder_stages.py, micro_vocoder_ops.py):
every vocoder stage costs ~7-10 ms under XLA regardless of FLOPs — the
3 resblocks x 3 dilation iterations x (2 convs + 2 anti-aliased snake
activations) lower to hundreds of kernels whose HBM round trips dominate
(each AA activation alone is ~0.2-0.3 ms, ~10x its traffic floor).  FLOPs
halve every stage, so the late stages (C <= 192) are pure op overhead.

This kernel evaluates ONE WHOLE STAGE per `pallas_call`: all 18 conv
weights stay VMEM-resident across the grid (<= 29 MB at C=192); the signal
streams through in overlapped time chunks with manually double-buffered
DMA.  Per chunk everything — snake phases, FIR up/down, dilated convs (as
per-tap rolls + (C, C) @ (C, W) MXU dots), residuals, the 3-block mean —
happens in VMEM.  HBM traffic drops to one read + one write of the (C, T)
signal per stage.

Edge semantics: interior output is exact vs the module path (margins of
128 lanes per chunk cover the stage's ~78-sample stencil halo).  At the two
SIGNAL edges the module replicate-pads each activation's input while this
kernel sees zeros there, so the outermost <= halo (~80) samples deviate
(sub-1e-2 for unit-scale signals; ~3.6 ms of audio at the segment
boundary, which the engine pads with 200 ms of silence anyway).  Same
tradeoff as the chunked AA kernel (`ops/aa_activation.py`), tested in
`tests/test_fused_vocoder.py`.

Replaces (together with the XLA upsample/conv_pre/conv_post that stay
outside) the role of the reference CUDA fused anti-alias activation
(`s2mel/modules/bigvgan/alias_free_activation/cuda/*.cu`) — but at stage
granularity instead of activation granularity.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voice_tts_tpu.config import BigVGANConfig
from voice_tts_tpu.ops.aa_activation import _H_EVEN, _H_ODD, _snake

_MARGIN = 128     # per-chunk overlap; must exceed the stage stencil halo


def _aa_core_aligned(w, alpha, beta_recip):
    """Anti-aliased snake on a signal-ALIGNED window: lane t of `w` holds
    x[t] (unlike `_aa_core_roll`, whose input is the 3-left-padded ext
    buffer).  Derived from `ops/aa_activation.py`: with x_ext[i] = x[i-3],
    u_e[t] = 2*sum_a h_odd[a] x[t+2-a], u_o[t] = 2*sum_a h_even[a] x[t+3-a];
    the down conv is already aligned.  Wraparound corrupts <= 8 edge lanes,
    inside the discarded margins."""
    def mac(taps, offset):
        acc = None
        for a, tap in enumerate(taps):
            shift = offset - a
            term = (w if shift == 0 else jnp.roll(w, -shift, axis=-1)) * tap
            acc = term if acc is None else acc + term
        return acc

    u_e = 2.0 * mac([float(v) for v in _H_ODD], 2)
    u_o = 2.0 * mac([float(v) for v in _H_EVEN], 3)
    z_e = _snake(u_e, alpha, beta_recip)
    z_o = _snake(u_o, alpha, beta_recip)

    def mac2(z, taps, offset):
        acc = None
        for b, tap in enumerate(taps):
            shift = offset + b
            term = (z if shift == 0 else jnp.roll(z, -shift, axis=-1)) * tap
            acc = term if acc is None else acc + term
        return acc

    return (mac2(z_e, [float(v) for v in _H_ODD], -2)
            + mac2(z_o, [float(v) for v in _H_EVEN], -3))


class StagePack(NamedTuple):
    """VMEM-resident parameters of one fused stage (C <= 192).

    Conv order: block-major, then (convs1_m, convs2_m) per iteration:
    index = block * 6 + 2 * m (+1 for convs2).  Activation order matches:
    act index = block * 6 + 2 * m (+1 for the post-conv1 act)."""

    w: jnp.ndarray      # (18, k_max, C, C) f32, taps centre-embedded
    b: jnp.ndarray      # (18, C, 1) f32
    alpha: jnp.ndarray  # (18, C, 1) f32 (exp already applied if log-scale)
    brec: jnp.ndarray   # (18, C, 1) f32 (1 / (beta + 1e-9))


def pack_stage(params: Dict[str, Any], stage: int,
               cfg: BigVGANConfig) -> StagePack:
    """Extract one stage's resblock params from the flax BigVGAN tree."""
    p = params["params"]
    nk = len(cfg.resblock_kernel_sizes)
    k_max = max(cfg.resblock_kernel_sizes)
    n_iter = len(cfg.resblock_dilation_sizes[0])
    has_beta = cfg.activation == "snakebeta"

    ws, bs, aa, br = [], [], [], []
    for j in range(nk):
        blk = p[f"resblocks_{stage * nk + j}"]
        for m in range(n_iter):
            for conv_name, act_idx in ((f"convs1_{m}", 2 * m),
                                       (f"convs2_{m}", 2 * m + 1)):
                w = blk[conv_name]["weight"].astype(jnp.float32)  # (C, C, k)
                pad = (k_max - w.shape[-1]) // 2
                if pad:
                    w = jnp.pad(w, ((0, 0), (0, 0), (pad, pad)))
                ws.append(jnp.transpose(w, (2, 0, 1)))            # (k, C, C)
                bs.append(blk[conv_name]["bias"].astype(jnp.float32)[:, None])
                act = blk[f"act_{act_idx}"]
                alpha = act["alpha"]
                beta = act["beta"] if has_beta else act["alpha"]
                if cfg.snake_logscale:
                    alpha, beta = jnp.exp(alpha), jnp.exp(beta)
                aa.append(alpha.astype(jnp.float32)[:, None])
                br.append((1.0 / (beta + 1e-9)).astype(jnp.float32)[:, None])
    return StagePack(jnp.stack(ws), jnp.stack(bs), jnp.stack(aa),
                     jnp.stack(br))


def _conv_roll(z, w_ref, b_ref, ci: int, dilation: int, k_max: int):
    """SAME dilated conv on the chunk window: per-tap lane roll + MXU dot.

    out[o, t] = sum_tap w[tap][o, i] z[i, t + d*(tap - centre)] + b[o].
    Window-edge wraparound from the rolls lands in the discarded margins."""
    centre = (k_max - 1) // 2
    acc = None
    for tap in range(k_max):
        shift = dilation * (tap - centre)
        zs = z if shift == 0 else jnp.roll(z, -shift, axis=-1)
        term = jnp.dot(w_ref[ci, tap], zs,
                       preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    return acc + b_ref[ci]


def _stage_kernel(t_ref, x_hbm, w_ref, b_ref, a_ref, r_ref, out_ref,
                  xbuf, sem, *, tt: int, nk: int, dilations: Sequence[int],
                  k_max: int):
    j = pl.program_id(0)
    n = pl.num_programs(0)
    width = tt + 2 * _MARGIN
    t_total = t_ref[0]

    def dma(idx, slot):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(idx * tt, width)], xbuf.at[slot], sem.at[slot])

    @pl.when(j == 0)
    def _():
        dma(0, 0).start()

    @pl.when(j + 1 < n)
    def _():
        dma(j + 1, jax.lax.rem(j + 1, 2)).start()

    dma(j, jax.lax.rem(j, 2)).wait()
    x0 = xbuf[jax.lax.rem(j, 2)]

    # zero out positions outside the signal: convs must see SAME zero padding
    # (the input buffer is already zero-padded; intermediate values would
    # otherwise leak conv biases outside the signal into edge stencils)
    pos = jax.lax.broadcasted_iota(jnp.int32, (x0.shape[0], width), 1) \
        + j * tt - _MARGIN
    valid = jnp.logical_and(pos >= 0, pos < t_total)

    def zmask(v):
        return jnp.where(valid, v, 0.0)

    x0 = zmask(x0)
    acc = None
    for blk in range(nk):
        xb = x0
        for m, d in enumerate(dilations):
            ci = blk * 2 * len(dilations) + 2 * m
            z = zmask(_aa_core_aligned(xb, a_ref[ci], r_ref[ci]))
            z = zmask(_conv_roll(z, w_ref, b_ref, ci, d, k_max))
            z = zmask(_aa_core_aligned(z, a_ref[ci + 1], r_ref[ci + 1]))
            z = zmask(_conv_roll(z, w_ref, b_ref, ci + 1, 1, k_max))
            xb = xb + z
        acc = xb if acc is None else acc + xb
    out_ref[...] = (acc * (1.0 / nk))[:, _MARGIN:_MARGIN + tt]


@functools.partial(jax.jit,
                   static_argnames=("dilations", "k_max", "tt", "interpret"))
def fused_resblock_stage(x: jnp.ndarray, pack: StagePack,
                         dilations: Sequence[int], k_max: int,
                         tt: int = 4096, interpret: bool = False) -> jnp.ndarray:
    """x (1, C, T) f32 (post-upsample) -> (1, C, T): mean over the stage's
    `nk` resblocks.  T is padded to a chunk multiple internally."""
    _, c, t = x.shape
    nk = pack.w.shape[0] // (2 * len(dilations))
    n = -(-t // tt)
    pad_r = n * tt + _MARGIN - t
    x_ext = jnp.pad(x[0], ((0, 0), (_MARGIN, pad_r)))

    kernel = functools.partial(_stage_kernel, tt=tt, nk=nk,
                               dilations=tuple(dilations), k_max=k_max)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # x_ext (HBM)
            pl.BlockSpec(pack.w.shape, lambda j, s: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pack.b.shape, lambda j, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pack.alpha.shape, lambda j, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pack.brec.shape, lambda j, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, tt), lambda j, s: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, c, tt + 2 * _MARGIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, n * tt), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([t], jnp.int32), x_ext, pack.w, pack.b, pack.alpha,
      pack.brec)
    return out[None, :, :t]


# ---------------------------------------------------------------------------
# full-model assembly: XLA conv_pre / upsamples / post, fused late stages
# ---------------------------------------------------------------------------

# weights for a fused stage must fit VMEM: 18 * k_max * C^2 * 4 bytes
_MAX_FUSED_CHANNELS = 192


def fused_stage_plan(cfg: BigVGANConfig) -> List[bool]:
    """Which upsample stages run the fused kernel (schedule must be packable
    and channels small enough for VMEM-resident weights)."""
    from voice_tts_tpu.models.vocoder.packed import can_pack
    if not can_pack(cfg):
        return [False] * len(cfg.upsample_rates)
    plan = []
    for i in range(len(cfg.upsample_rates)):
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        plan.append(ch <= _MAX_FUSED_CHANNELS)
    return plan


def pack_fused_stages(params: Dict[str, Any],
                      cfg: BigVGANConfig) -> Dict[int, StagePack]:
    """Device-side pack of every fused-eligible stage (call under jit)."""
    return {i: pack_stage(params, i, cfg)
            for i, fused in enumerate(fused_stage_plan(cfg)) if fused}


def _tt_for_channels(c: int) -> int:
    # bound VMEM: double-buffered input + ~8 live intermediates of (C, W).
    # Overridable (FUSED_VOC_TT): Mosaic compile time grows superlinearly in
    # the chunk width (the ~2k lane-roll ops lower to per-lane shuffles over
    # the whole window) — the 2048/4096 defaults exceeded a 420 s compile
    # budget at C in {96, 192} (COMPILE_GATE r3), narrower chunks trade a
    # few % runtime for a compile that finishes
    import os
    env = os.environ.get("FUSED_VOC_TT")
    if env:
        return int(env)
    return 2048 if c > 96 else 4096


def bigvgan_fused_apply(voc_params: Dict[str, Any],
                        stage_packs: Dict[int, StagePack], mel: jnp.ndarray,
                        cfg: BigVGANConfig, use_pallas=None,
                        interpret: bool = False) -> jnp.ndarray:
    """BigVGAN forward with fused late stages.  Batch must be 1 for the
    fused kernels (the single-request latency path); larger batches should
    use the module path where weight reads amortize."""
    from voice_tts_tpu.models.layers import Conv1d, ConvTranspose1d
    from voice_tts_tpu.models.vocoder.bigvgan import AMPBlock1, SnakeParams
    from voice_tts_tpu.ops import aa_snake_activation

    nk = len(cfg.resblock_kernel_sizes)
    k_max = max(cfg.resblock_kernel_sizes)
    dilations = tuple(cfg.resblock_dilation_sizes[0])
    snake_beta = cfg.activation == "snakebeta"
    p = voc_params["params"]

    def sub(name):
        return {"params": p[name]}

    x = Conv1d(cfg.upsample_initial_channel, 7, padding=3).apply(
        sub("conv_pre"), mel)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        x = ConvTranspose1d(ch, k, stride=u, padding=(k - u) // 2).apply(
            sub(f"ups_{i}"), x)
        if i in stage_packs and x.shape[0] == 1:
            x = fused_resblock_stage(x, stage_packs[i], dilations, k_max,
                                     tt=_tt_for_channels(ch),
                                     interpret=interpret)
        else:
            xs = None
            for j in range(nk):
                out = AMPBlock1(ch, cfg.resblock_kernel_sizes[j],
                                tuple(cfg.resblock_dilation_sizes[j]),
                                cfg.snake_logscale, snake_beta,
                                use_pallas).apply(
                    sub(f"resblocks_{i * nk + j}"), x)
                xs = out if xs is None else xs + out
            x = xs / nk

    sp = SnakeParams(x.shape[1], cfg.snake_logscale, snake_beta)
    a, br = sp.apply(sub("activation_post"))
    x = aa_snake_activation(x, a, br, use_pallas=use_pallas)
    x = Conv1d(1, 7, padding=3, use_bias=cfg.use_bias_at_final).apply(
        sub("conv_post"), x)
    if cfg.use_tanh_at_final:
        return jnp.tanh(x)
    return jnp.clip(x, -1.0, 1.0)
