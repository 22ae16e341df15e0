"""Whole-sequence Pallas attention for the DiT's CFM shapes.

The DiT runs full (non-causal) self-attention at small-batch, short-T
shapes (CFG-doubled batch 2, 8 heads, T ~ 700, head_dim 64,
`models/s2mel/dit.py`).  The XLA einsum path materializes the (B, H, T, T)
score tensor in HBM **in f32** (softmax stats are kept f32 even on the
bf16 path), so each of the 13 blocks moves ~130 MB of score traffic per
CFM step — the dominant cost of the 25-step Euler solve.  The generic
`jax.experimental.pallas` flash kernel was measured 5x slower here: its
3-level grid is built for long sequences and pays fixed overhead per
block that these shapes never amortize.

This kernel instead holds ONE (T, T) f32 score tile entirely in VMEM per
grid program (grid = B*H programs; T <= ~1.5k keeps the tile under 9 MB):
qk^T, key-validity mask, softmax, and the probs @ v contraction all happen
on-core with zero score HBM traffic.  Key padding positions are masked to
a large negative (finite, so fully-padded query rows stay NaN-free); the
caller discards padded-query outputs.

Replaces (for the s2mel stage) the role DeepSpeed kernel injection plays
in the reference (`indextts/gpt/model_v2.py:433-446`); the reference DiT
itself runs plain eager attention (`s2mel/modules/gpt_fast/model.py`).

MEASURED (v5e, B=2/H=8/T=704/hd=64, scripts/bench_cfm_attn.py): velocity
eval 2.37 ms vs 1.93 ms einsum; 25-step CFM solve 62.5 ms vs 46.8 ms.
XLA already fuses mask+softmax into the score matmuls and keeps the
(T, T) block resident at these sizes, so the kernel's saved HBM traffic
doesn't materialize as time.  Default stays OFF
(`DiTConfig.fused_attention`); kept for long-T DiT configs where the
score tensor genuinely spills.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float):
    b = pl.program_id(0) // heads
    n = lens_ref[b]
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    t = q.shape[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    s = jnp.where(col < n, s, _NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    o_ref[0] = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def cfm_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  lens: jnp.ndarray, scale: float,
                  interpret: bool = False) -> jnp.ndarray:
    """q, k, v (B, H, T, hd); lens (B,) int32 valid KEY counts per row.

    Returns (B, H, T, hd) in v.dtype.  Outputs at query positions >= lens
    are well-defined junk (uniform attention over a masked row) — callers
    mask by length downstream, matching the einsum path's behavior.
    """
    b, h, t, hd = q.shape
    pad = (-t) % 128
    if pad:
        zq = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = (jnp.pad(a, zq) for a in (q, k, v))
    tp = t + pad

    def reshaped(a):
        return a.reshape(b * h, tp, hd)

    spec = pl.BlockSpec((1, tp, hd), lambda i, s_: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, heads=h, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, hd), v.dtype),
        interpret=interpret,
    )(lens.astype(jnp.int32), reshaped(q), reshaped(k), reshaped(v))
    return out.reshape(b, h, tp, hd)[:, :, :t]
