"""Pallas decode attention: single-token queries over a preallocated KV cache
with length-bounded HBM reads.

XLA's decode attention reads the *entire* (Tmax-sized) cache every step; this
kernel DMAs only the blocks covering [0, pos], cutting cache traffic to the
live prefix (the dominant decode cost once requests batch).  Replaces the
role DeepSpeed's injected fused attention plays in the reference
(`model_v2.py:433-446`).

Layout: cache (B, H, hd, T) (time-minor, dense tiles); q (B, H, hd);
bias (B, T) additive f32 mask (-inf at padded prompt positions).
Flash-style online softmax over T blocks, fori_loop with a dynamic bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_T = 512


def _kernel(pos_ref, q_ref, bias_ref, k_ref, v_ref, o_ref):
    """Grid: (B,).  q_ref (1, H, hd) VMEM; k_ref/v_ref full (B, H, hd, T) and
    bias_ref full (B, T) in ANY (batch indexed in-kernel);
    pos_ref scalar-prefetch (1,) = attend length."""
    h, hd = q_ref.shape[1], q_ref.shape[2]
    bi = pl.program_id(0)
    length = pos_ref[0]                      # number of attendable positions
    n_blocks = pl.cdiv(length, BLOCK_T)

    def body(kbuf, vbuf, sem_k, sem_v):
        q = q_ref[0].astype(jnp.float32)     # (H, hd)

        def dma_k(j, slot):
            return pltpu.make_async_copy(
                k_ref.at[bi, :, :, pl.ds(j * BLOCK_T, BLOCK_T)],
                kbuf.at[slot], sem_k.at[slot])

        def dma_v(j, slot):
            return pltpu.make_async_copy(
                v_ref.at[bi, :, :, pl.ds(j * BLOCK_T, BLOCK_T)],
                vbuf.at[slot], sem_v.at[slot])

        # warm-up: prefetch block 0 into slot 0
        dma_k(0, 0).start()
        dma_v(0, 0).start()

        def step(j, carry):
            m, l, acc = carry
            slot = jax.lax.rem(j, 2)
            next_slot = jax.lax.rem(j + 1, 2)

            # double buffering: start block j+1 while computing block j
            @pl.when(j + 1 < n_blocks)
            def _():
                dma_k(j + 1, next_slot).start()
                dma_v(j + 1, next_slot).start()

            dma_k(j, slot).wait()
            t0 = j * BLOCK_T
            k = kbuf[slot].astype(jnp.float32)   # (H, hd, BT)
            # VPU multiply-reduce: batched (per-head) GEMV doesn't lower to
            # the MXU in Mosaic, and this kernel is DMA-bound regardless
            scores = jnp.sum(q[:, :, None] * k, axis=1)  # (H, BT)
            scores = scores * (hd ** -0.5)
            bias_blk = bias_ref[0, 0, pl.ds(t0, BLOCK_T)]
            scores = scores + bias_blk.astype(jnp.float32)[None, :]
            # mask positions beyond the live length in the final block
            col = jax.lax.broadcasted_iota(jnp.int32, (h, BLOCK_T), 1) + t0
            scores = jnp.where(col < length, scores, -jnp.inf)

            m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(scores - m_new)      # (H, BT)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)

            dma_v(j, slot).wait()
            v = vbuf[slot].astype(jnp.float32)   # (H, hd, BT)
            pv = jnp.sum(p[:, None, :] * v, axis=2)  # (H, hd)
            acc_new = acc * alpha + pv
            return m_new, l_new, acc_new

        m0 = jnp.full((h, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((h, 1), jnp.float32)
        a0 = jnp.zeros((h, hd), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_blocks, step, (m0, l0, a0))
        o_ref[0] = (acc / l).astype(o_ref.dtype)

    pl.run_scoped(
        body,
        kbuf=pltpu.VMEM((2, h, hd, BLOCK_T), k_ref.dtype),
        vbuf=pltpu.VMEM((2, h, hd, BLOCK_T), v_ref.dtype),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                     bias: jnp.ndarray, length: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """q (B, H, hd); k/v (B, H, hd, Tmax); bias (B, Tmax) f32 additive;
    length scalar int32 = attendable positions.  Returns (B, H, hd)."""
    b, h, hd = q.shape
    assert k_cache.shape[3] % BLOCK_T == 0, "cache length must be a multiple of BLOCK_T"
    pos = jnp.asarray([length], dtype=jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, hd), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bias.shape[1]), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, h, hd), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, hd), q.dtype),
        interpret=interpret,
    )(pos, q, bias[:, None, :], k_cache, v_cache)
