"""Pallas int8 weight-only GEMV for the bandwidth-bound GPT decode path.

AR decode reads every projection matrix once per token; at batch≲8 the MXU is
idle and step time ≈ weight bytes / HBM bandwidth.  Storing W as int8 halves
the bytes — but XLA materializes the dequantizing convert as a separate
kernel (measured *slower* than bf16, see STATUS.md), so the convert must
happen in VMEM inside the matmul kernel.  That fusion is exactly what this
kernel does: DMA int8 tiles, upcast in-register, one MXU dot per tile.

Replaces the role DeepSpeed's fused quantized GEMM plays in the reference
serving stack (`model_v2.py:433-446` injection point).

Layout matches `voice_tts_tpu.utils.quantize`: W (in, out) int8 with
per-output-channel scale (1, out) f32; y = (x @ W) * scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, o_ref):
    # x (N, D) bf16; w (D, FT) int8; s (1, FT) f32 -> o (N, FT)
    # int8 -> bf16 is exact (|q| <= 127), so the dot matches the XLA
    # dequant path bit-for-bit while reading half the HBM bytes.
    w = w_ref[...].astype(x_ref.dtype)
    y = jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)
    o_ref[...] = (y * s_ref[...]).astype(o_ref.dtype)


def _f_tile(f: int) -> int:
    for t in (1024, 512, 256, 128):
        if f % t == 0:
            return t
    return f


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_gemv(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """x (N, D); w_q (D, F) int8; scale (1, F) f32.  Returns (N, F) x.dtype.

    Grid over F tiles; Pallas auto-pipelines the (double-buffered) int8 tile
    DMAs against the MXU dots.
    """
    n, d = x.shape
    f = w_q.shape[1]
    ft = _f_tile(f)
    out = pl.pallas_call(
        _kernel,
        grid=(f // ft,),
        in_specs=[
            pl.BlockSpec((n, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ft), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ft), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, ft), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, f), x.dtype),
        interpret=interpret,
    )(x, w_q, scale.reshape(1, f))
    return out
