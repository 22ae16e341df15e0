"""Fused anti-aliased snake activation (BigVGAN AMP block activation).

The reference computes `UpSample1d(2x) -> snake(beta) -> DownSample1d(2x)`
either as three torch modules (`alias_free_activation/torch/act.py`) or as one
fused CUDA kernel (`alias_free_activation/cuda/anti_alias_activation_cuda.cu`).

Here the whole composite is expressed in *polyphase* form so the 2x-upsampled
intermediate is never materialized:

With the 12-tap kaiser-sinc filter ``h`` (cutoff 0.25, half-width 0.3, the
values used for ratio=2), ``x_ext`` = x replicate-padded (3 left, 4 right):

    u_even[t] = 2 * sum_a h[2a+1] * x_ext[t + 5 - a]        (a = 0..5)
    u_odd[t]  = 2 * sum_a h[2a]   * x_ext[t + 6 - a]
    z_even    = snake(u_even),  z_odd = snake(u_odd)
    out[t]    = sum_b h[2b+1] * ze_ext[t + b + 1]
              + sum_b h[2b]   * zo_ext[t + b]               (b = 0..5)

where ``ze_ext``/``zo_ext`` are the phases extended by 3 on each side with the
interleaved-signal edge values (left edge replicates z_even[0]; right edge
replicates z_odd[-1]).  Derivation: conv_transpose(stride 2) splits into two
6-tap phase filters; the stride-2 lowpass consumes each phase with its own
6 taps.

Everything is a static-shift multiply-accumulate on (channels, time) tiles —
ideal VPU work.  Two implementations share this math:

- `_aa_snake_jnp`: pure jnp (CPU tests / fallback / autodiff)
- `_aa_snake_pallas`: one Pallas kernel, grid over (batch*channel tiles),
  double-use of VMEM: reads x once, writes out once (the torch path does
  ~6 HBM round-trips).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# filter construction (host-side)
# ---------------------------------------------------------------------------

def kaiser_sinc_filter(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc lowpass, matching the reference
    `alias_free_activation/torch/filter.py:30-62` (sum-normalized)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2

    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)

    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


_FILTER12 = kaiser_sinc_filter(0.25, 0.3, 12)  # the ratio=2 filter
_H_ODD = _FILTER12[1::2]   # taps h[1],h[3],...,h[11]
_H_EVEN = _FILTER12[0::2]  # taps h[0],h[2],...,h[10]


def _snake(x, alpha, beta_recip):
    """x + (1/beta) * sin^2(alpha * x); alpha/beta_recip broadcast over time."""
    s = jnp.sin(x * alpha)
    return x + beta_recip * s * s


def _phase_mac(x_ext, taps, offset):
    """sum_a taps[a] * x_ext[..., t + offset - a] for t in [0, T)."""
    n = x_ext.shape[-1] - 6 - 1  # T (x_ext length is T+7)
    acc = None
    for a, tap in enumerate(taps):
        sl = jax.lax.slice_in_dim(x_ext, offset - a, offset - a + n, axis=-1)
        acc = sl * tap if acc is None else acc + sl * tap
    return acc


def _down_mac(ze_ext, zo_ext, t_len):
    acc = None
    for b in range(6):
        sl_e = jax.lax.slice_in_dim(ze_ext, b + 1, b + 1 + t_len, axis=-1)
        sl_o = jax.lax.slice_in_dim(zo_ext, b, b + t_len, axis=-1)
        term = sl_e * float(_H_ODD[b]) + sl_o * float(_H_EVEN[b])
        acc = term if acc is None else acc + term
    return acc


def _aa_core(x_ext, alpha, beta_recip):
    """Shared math: x_ext (..., T+7) -> out (..., T)."""
    t_len = x_ext.shape[-1] - 7
    u_e = 2.0 * _phase_mac(x_ext, [float(v) for v in _H_ODD], 5)
    u_o = 2.0 * _phase_mac(x_ext, [float(v) for v in _H_EVEN], 6)
    z_e = _snake(u_e, alpha, beta_recip)
    z_o = _snake(u_o, alpha, beta_recip)
    # interleaved-edge replicate: left pads take z_e[0], right pads take z_o[-1]
    left = jnp.repeat(z_e[..., :1], 3, axis=-1)
    right = jnp.repeat(z_o[..., -1:], 3, axis=-1)
    ze_ext = jnp.concatenate([left, z_e, right], axis=-1)
    zo_ext = jnp.concatenate([left, z_o, right], axis=-1)
    return _down_mac(ze_ext, zo_ext, t_len)


# ---------------------------------------------------------------------------
# jnp implementation
# ---------------------------------------------------------------------------

def _aa_snake_jnp(x, alpha, beta_recip):
    """x (B, C, T) -> (B, C, T); alpha/beta_recip (C,)."""
    x_ext = jnp.concatenate(
        [jnp.repeat(x[..., :1], 3, axis=-1), x, jnp.repeat(x[..., -1:], 4, axis=-1)],
        axis=-1)
    return _aa_core(x_ext, alpha[None, :, None], beta_recip[None, :, None])


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

_C_TILE = 8      # sublane tile
_T_TILE = 8192   # time (lane) tile per kernel invocation; bounds VMEM use


def _aa_kernel_small(x_ref, alpha_ref, beta_ref, out_ref):
    # blocks carry a leading grid dim of size 1
    x_ext = x_ref[0]                         # (C_TILE, T+7), already padded
    out_ref[0] = _aa_core(x_ext, alpha_ref[0], beta_ref[0])


def _aa_core_roll(w, alpha, beta_recip):
    """`_aa_core` with rolls instead of shifted slices (chunked kernel only:
    cyclic wraparound corrupts <=6 lanes at the window edges, which lie in
    the discarded >=121-lane margins).  Lane-rolls lower to one Mosaic op vs
    a realigning strided slice per tap."""
    def roll(v, shift):
        return v if shift == 0 else jnp.roll(v, shift, axis=-1)

    def mac(taps, offset):
        acc = None
        for a, tap in enumerate(taps):
            term = roll(w, -(offset - a)) * tap
            acc = term if acc is None else acc + term
        return acc

    u_e = 2.0 * mac([float(v) for v in _H_ODD], 5)
    u_o = 2.0 * mac([float(v) for v in _H_EVEN], 6)
    z_e = _snake(u_e, alpha, beta_recip)
    z_o = _snake(u_o, alpha, beta_recip)

    def mac2(z, taps, offset):
        acc = None
        for b, tap in enumerate(taps):
            term = roll(z, -(offset + b)) * tap
            acc = term if acc is None else acc + term
        return acc

    # ze/zo are aligned with u (output index t ~ lane t); down conv:
    # out[t] = sum_b h_odd[b] * z_e[t + b - 2] + h_even[b] * z_o[t + b - 3]
    # (derived from the ext-padded form: ze_ext[t+b+1] with 3-pad == z_e at
    # t + b - 2; zo_ext[t+b] == z_o at t + b - 3)
    return (mac2(z_e, [float(v) for v in _H_ODD], -2)
            + mac2(z_o, [float(v) for v in _H_EVEN], -3))


def _aa_kernel_chunked(x_hbm, alpha_ref, beta_ref, out_ref, buf, sem, *, tt):
    """One (channel-tile, time-chunk) grid step over the padded signal.

    Reads an overlapped (C_TILE, tt+256) window straight from HBM (the
    signal carries a 128-column replicate pad on the left, so every window
    start j*tt and the window length are 128-aligned — a Mosaic DMA
    requirement — with no per-chunk branches).  Interior margins are
    discarded; no host-side chunk stacking or restitching (the old wrapper's
    stack/tile/concat cost several extra HBM passes and made the kernel
    2.3x slower than XLA's lowering of the jnp path).

    Edge note: the long replicate pads mean the first/last ~3 output samples
    see snake(x_edge) where the unchunked path replicates the z phases —
    a sub-1e-3 filter-tail deviation confined to those samples (tested).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[i, :, pl.ds(j * tt, tt + 256)], buf, sem)
    cp.start()
    cp.wait()
    core = _aa_core_roll(buf[...], alpha_ref[0], beta_ref[0])
    out_ref[0] = core[:, 128:128 + tt]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _aa_snake_pallas(x, alpha, beta_recip, interpret=False):
    b, c, t = x.shape
    c_pad = (-c) % _C_TILE
    if c_pad:
        x = jnp.pad(x, ((0, 0), (0, c_pad), (0, 0)))
        alpha = jnp.pad(alpha, (0, c_pad))
        beta_recip = jnp.pad(beta_recip, (0, c_pad), constant_values=1.0)
    cp = c + c_pad
    alpha_b = jnp.tile(alpha.reshape(cp // _C_TILE, _C_TILE, 1), (b, 1, 1))
    beta_b = jnp.tile(beta_recip.reshape(cp // _C_TILE, _C_TILE, 1), (b, 1, 1))
    rows = b * cp // _C_TILE

    if t + 7 <= _T_TILE + 19:
        x_ext = jnp.concatenate(
            [jnp.repeat(x[..., :1], 3, axis=-1), x,
             jnp.repeat(x[..., -1:], 4, axis=-1)],
            axis=-1).reshape(rows, _C_TILE, t + 7)
        out = pl.pallas_call(
            _aa_kernel_small,
            grid=(rows,),
            in_specs=[
                pl.BlockSpec((1, _C_TILE, t + 7), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _C_TILE, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _C_TILE, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, _C_TILE, t), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, _C_TILE, t), x.dtype),
            interpret=interpret,
        )(x_ext, alpha_b, beta_b)
        return out.reshape(b, cp, t)[:, :c, :]

    # chunked path: [128 rep | 3 rep | x | 4 rep | rep to n*tt + 256]
    n = -(-t // _T_TILE)
    pad_r = n * _T_TILE + 256 - 128 - (t + 7)
    x_ext = jnp.concatenate(
        [jnp.repeat(x[..., :1], 131, axis=-1), x,
         jnp.repeat(x[..., -1:], 4 + pad_r, axis=-1)],
        axis=-1).reshape(rows, _C_TILE, n * _T_TILE + 256)
    kernel = functools.partial(_aa_kernel_chunked, tt=_T_TILE)
    out = pl.pallas_call(
        kernel,
        grid=(rows, n),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # x_ext in HBM
            pl.BlockSpec((1, _C_TILE, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _C_TILE, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _C_TILE, _T_TILE), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, _C_TILE, n * _T_TILE), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((_C_TILE, _T_TILE + 256), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_ext, alpha_b, beta_b)
    return out.reshape(b, cp, n * _T_TILE)[:, :c, :t]


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def aa_snake_activation(x: jnp.ndarray, alpha: jnp.ndarray, beta_recip: jnp.ndarray,
                        use_pallas: bool | None = None,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused 2x-up -> snake -> 2x-down activation.

    Args:
      x: (B, C, T) float32.
      alpha: (C,) snake frequency (already exponentiated if log-scale).
      beta_recip: (C,) precomputed 1/(beta + 1e-9) magnitude term.
      use_pallas: force kernel choice; default False — chained-execution
        measurement on v5e (scripts/bench_vocoder.py) shows XLA's lowering of
        the polyphase jnp path beats this kernel 2.3x at full-vocoder scale
        (43 vs 97 ms for 5.2 s of audio), so the fused kernel is opt-in.
    """
    if use_pallas is None:
        use_pallas = False
    if use_pallas or interpret:
        # the kernel only compiles on TPU; fall back to interpret elsewhere
        interpret = interpret or jax.default_backend() != "tpu"
        if x.dtype != jnp.float32:
            # Mosaic rejects the kernel's sub-f32 reshapes (vector<8x1xbf16>);
            # the FIR taps are f32 anyway, so compute in f32 and cast back
            return _aa_snake_pallas(x.astype(jnp.float32), alpha, beta_recip,
                                    interpret=interpret).astype(x.dtype)
        return _aa_snake_pallas(x, alpha, beta_recip, interpret=interpret)
    return _aa_snake_jnp(x, alpha, beta_recip)
