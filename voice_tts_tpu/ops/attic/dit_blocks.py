"""DiT transformer trunk megakernel: all 13 blocks in ONE Pallas call.

Why: the CFM Euler solve evaluates the DiT velocity 25 times per request.
At serving shapes (CFG-doubled batch 2, T ~ 700, D 512) each block's ~15
XLA ops read+write a (B*T, D) f32 activation in HBM — ~1.1 GB of pure
activation traffic per velocity eval (~1.3 ms at v5e's 819 GB/s), on top
of the matmul FLOPs (~0.6 ms).  XLA fuses the elementwise chains but not
across the matmuls, so the measured eval sits at ~1.9 ms.  This kernel
keeps the residual stream in VMEM scratch across the whole 13-block trunk:
HBM traffic collapses to the weights (once, ~55 MB bf16) plus the trunk
input/output.

Structure (mirrors `ops/fused_decode.py`'s stage-grid scheme):

    grid = (depth, 5)  — 5 weight-tile groups per block, each (3, D, D):
      g0 [Wq | Wk | Wv]     qkv projection + RoPE (block's adaRMS first)
      g1 [Wo | -- | -- ]    attention (per row, per head) + out projection
      g2..g4 [W1_j|W3_j|W2_j]  SwiGLU FFN, inner dim split in 3 column tiles
                               (j-th partial accumulated straight into h)

Pallas streams the next (3, D, D) bf16 group while the current one
computes.  The timestep-conditioned adaLN weight/bias pairs arrive
precomputed per CFM step (`DiT.step_tables`) with the inner RMSNorm scale
folded in (`pack_dit_tables`) — the kernel never touches the timestep
embedding.  RoPE (interleaved-pair rotation, `models/s2mel/dit.py:50-59`)
is applied as q*cos + (q@P)*sin with a block-diagonal +-1 permutation P —
a lane swap expressed as one MXU matmul, since Mosaic cannot shape-cast
(T, D) to pair-interleaved layouts.

Limits: full (T, T) f32 score tile per (row, head) in VMEM — T <= ~768
(the serving buckets; the einsum path covers anything larger).  Storage of
q/k/v/activations between stages is bf16 (f32 accumulation everywhere),
so this is a ~1e-2-relative path vs the f32 einsum trunk: opt-in via
`DiTConfig.fused_blocks`, exact parity stays with the default path.

Replaces (for the s2mel stage) the role DeepSpeed kernel injection plays in
the reference (`indextts/gpt/model_v2.py:433-446`); the reference DiT runs
eager unfused attention (`s2mel/modules/gpt_fast/model.py:242-308`).

MEASURED (v5e, B=2/T=704/D=512, scripts/bench_dit_fused.py): velocity eval
3.88 ms vs 2.23 ms XLA; 25-step CFM 91.2 vs 46.6 ms — the kernel LOSES ~2x.
Where the theory broke: XLA already keeps most of the inter-matmul
activations fused/on-chip at these shapes, so the saved HBM traffic was
smaller than modeled, while the kernel pays real costs XLA does not — 16
per-(row,head) attention dots at 64-wide contraction (half-rate MXU + lane
-slice relayouts), serialized VPU softmax over 7.9M score elements per
block, and 65 sequential grid programs with no inter-stage overlap beyond
the weight stream.  Default stays OFF (`DiTConfig.fused_blocks`); kept as
a correctness-tested base for a future revision (head-packed score layout,
query-block softmax pipelining).  The same stage-grid scheme WINS 2.6x at
decode shapes (`ops/fused_decode.py`) where per-op overhead dominates —
the lesson is that at (T>512, D) shapes XLA's fusion is already near the
roofline and hand kernels must bring a layout advantage, not just fusion.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def rope_tables(t_len: int, head_dim: int, base: float):
    """Expanded interleaved RoPE tables: cos/sin (T, head_dim) — shared by
    every head — and the pair-swap matrix P (head_dim, head_dim) with
    (qP)[2i] = -q[2i+1], (qP)[2i+1] = q[2i]."""
    half = head_dim // 2
    freqs = 1.0 / (base ** (np.arange(0, head_dim, 2)[:half] / head_dim))
    angles = np.outer(np.arange(t_len), freqs)          # (T, half)
    cos = np.repeat(np.cos(angles), 2, axis=1).astype(np.float32)
    sin = np.repeat(np.sin(angles), 2, axis=1).astype(np.float32)
    p = np.zeros((head_dim, head_dim), np.float32)
    idx = np.arange(0, head_dim, 2)
    p[idx + 1, idx] = -1.0
    p[idx, idx + 1] = 1.0
    return jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(p)


def can_fuse_dit(dcfg) -> bool:
    """Geometry the kernel supports: flagship-style blocks (FFN inner ==
    3*hidden, i.e. find_multiple(8D/3, 256) == 3D — true for D 256/512),
    64-lane heads (Mosaic-friendly lane slices), even rope pairs."""
    d = dcfg.hidden_dim
    if d % dcfg.num_heads or d // dcfg.num_heads != 64:
        return False
    inner = d * 8 // 3
    inner = inner if inner % 256 == 0 else inner + 256 - inner % 256
    return inner == 3 * d


@functools.partial(jax.jit, static_argnames=("depth",))
def pack_dit_blocks(params: Dict[str, Any], depth: int) -> jnp.ndarray:
    """Stack every DiT block's matmul weights into uniform (depth, 5, 3,
    D, D) bf16 tile groups (see module docstring for the group layout).
    Runs jitted on device — never pulls the trunk over the host link."""
    p = params["params"]
    groups = []
    for i in range(depth):
        blk = p[f"block_{i}"]
        d = blk["wo"]["weight"].shape[0]

        def t(w):  # Linear stores (out, in); x @ w.T -> tile is w.T slice
            return w.astype(jnp.bfloat16).T

        wqkv = blk["wqkv"]["weight"]                    # (3D, D)
        w1, w3 = blk["w1"]["weight"], blk["w3"]["weight"]   # (inner, D)
        w2 = blk["w2"]["weight"]                        # (D, inner)
        inner = w1.shape[0]
        assert inner == 3 * d, (
            f"dit_blocks kernel expects FFN inner == 3*D, got {inner}")
        g0 = jnp.stack([t(wqkv[j * d:(j + 1) * d]) for j in range(3)])
        g1 = jnp.stack([t(blk["wo"]["weight"]),
                        jnp.zeros((d, d), jnp.bfloat16),
                        jnp.zeros((d, d), jnp.bfloat16)])
        ffn = [jnp.stack([t(w1[j * d:(j + 1) * d]),
                          t(w3[j * d:(j + 1) * d]),
                          t(w2[:, j * d:(j + 1) * d])]) for j in range(3)]
        groups.append(jnp.stack([g0, g1] + ffn))        # (5, 3, D, D)
    return jnp.stack(groups)


def pack_dit_tables(params: Dict[str, Any], tables, depth: int):
    """Fold each block's inner RMSNorm scale into the hoisted adaLN
    weight halves: (S, depth, 2, 2D) f32 ready for the kernel.

    `tables` is `DiT.step_tables(t_span)` — its `blocks[i]` entry is a
    (attn_wb, ffn_wb) pair of (S, 1, 2D) projections (the timestep is
    shared across batch rows).  adaRMS computes `wb_w * (x_hat * rms_w)
    + wb_b`; the kernel runs `x_hat * w' + b'` with w' = wb_w * rms_w."""
    p = params["params"]
    per_block = []
    for i in range(depth):
        blk = p[f"block_{i}"]
        out = []
        for name, wb in zip(("attention_norm", "ffn_norm"),
                            tables["blocks"][i]):
            rms_w = blk[name]["norm"]["weight"].astype(jnp.float32)
            w, b = jnp.split(wb[:, 0, :].astype(jnp.float32), 2, axis=-1)
            out.append(jnp.concatenate([w * rms_w, b], axis=-1))
        per_block.append(jnp.stack(out))                # (2, S, 2D)
    return jnp.transpose(jnp.stack(per_block), (2, 0, 1, 3))


def _kernel(lens_ref, x_ref, w_ref, wb_ref, cos_ref, sin_ref, perm_ref,
            y_ref, h_s, q_s, k_s, v_s, y_s, *, batch, heads, eps):
    layer = pl.program_id(0)
    t = pl.program_id(1)
    n_layers = pl.num_programs(0)
    bt, d = h_s.shape
    tl = bt // batch
    hd = d // heads

    def ada_rms(kind):
        """adaRMS of the residual: x_hat * w' + b' (t shared across rows)."""
        x = h_s[...]
        norm = x * jax.lax.rsqrt(
            jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        return norm * wb_ref[0, kind, :d] + wb_ref[0, kind, d:]

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), w,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    # ---- stage 0: load x (first layer), attn adaRMS, qkv + RoPE ----------
    @pl.when(t == 0)
    def _():
        @pl.when(layer == 0)
        def _():
            h_s[...] = x_ref[...].astype(jnp.float32)
        y = ada_rms(0)
        cos = cos_ref[...].astype(jnp.float32)
        sin = sin_ref[...].astype(jnp.float32)
        # q fully (project+rope+store) before k: halves the f32 stack peak
        for idx, dst in ((0, q_s), (1, k_s)):
            z = dot(y, w_ref[0, 0, idx])
            for b in range(batch):
                rows = slice(b * tl, (b + 1) * tl)
                for hh in range(heads):
                    lanes = slice(hh * hd, (hh + 1) * hd)
                    zh = z[rows, lanes]
                    dst[rows, lanes] = (
                        zh * cos + dot(zh, perm_ref[...]) * sin
                    ).astype(jnp.bfloat16)
        v_s[...] = dot(y, w_ref[0, 0, 2]).astype(jnp.bfloat16)

    # ---- stage 1: attention per (row, head), out projection --------------
    @pl.when(t == 1)
    def _():
        scale = hd ** -0.5
        col = jax.lax.broadcasted_iota(jnp.int32, (tl, tl), 1)
        for b in range(batch):
            n = lens_ref[b]
            mask_ok = col < n
            rows = slice(b * tl, (b + 1) * tl)
            for hh in range(heads):
                lanes = slice(hh * hd, (hh + 1) * hd)
                qh = q_s[rows, lanes].astype(jnp.float32) * scale
                kh = k_s[rows, lanes].astype(jnp.float32)
                s = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s = jnp.where(mask_ok, s, _NEG)
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=1, keepdims=True)
                # q lanes of this head are dead once scores exist — reuse
                # q_s as the attention-context buffer (saves a scratch)
                q_s[rows, lanes] = jnp.dot(
                    p.astype(jnp.bfloat16), v_s[rows, lanes],
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        h_s[...] = h_s[...] + dot(q_s[...], w_ref[0, 0, 0])

    # ---- stage 2: ffn adaRMS (cached), then SwiGLU partials j = t-2 ------
    @pl.when(t == 2)
    def _():
        y_s[...] = ada_rms(1).astype(jnp.bfloat16)

    for j in range(3):
        @pl.when(t == 2 + j)
        def _(j=j):
            gate = dot(y_s[...], w_ref[0, 0, 0])
            gate = gate * jax.nn.sigmoid(gate)          # silu, f32
            up = dot(y_s[...], w_ref[0, 0, 1])
            h_s[...] = h_s[...] + dot(
                (gate * up).astype(jnp.bfloat16), w_ref[0, 0, 2])

    @pl.when(t == 4)
    def _():
        @pl.when(layer == n_layers - 1)
        def _():
            y_ref[...] = h_s[...].astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def dit_block_chain(x: jnp.ndarray, w_tiles: jnp.ndarray, wb: jnp.ndarray,
                    cos: jnp.ndarray, sin: jnp.ndarray, perm: jnp.ndarray,
                    x_lens: jnp.ndarray, heads: int,
                    interpret: bool = False) -> jnp.ndarray:
    """Run the whole DiT trunk.  x (B, T, D); w_tiles (L, 5, 3, D, D) bf16
    (`pack_dit_blocks`); wb (L, 2, 2D) f32 — ONE step's slice of
    `pack_dit_tables`; cos/sin (T, D), perm (D, D) (`rope_tables`);
    x_lens (B,) valid KEY counts.  Returns (B, T, D) in x.dtype; rows at
    query positions >= x_lens are junk exactly like the einsum path."""
    b, tl, d = x.shape
    l = w_tiles.shape[0]
    hd = d // heads
    assert wb.shape == (l, 2, 2 * d) and cos.shape == (tl, hd)

    spec_bt = pl.BlockSpec((b * tl, d), lambda i, t, s: (0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, batch=b, heads=heads, eps=1e-5),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(l, 5),
            in_specs=[
                spec_bt,
                pl.BlockSpec((1, 1, 3, d, d), lambda i, t, s: (i, t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, 2 * d), lambda i, t, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tl, hd), lambda i, t, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tl, hd), lambda i, t, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hd, hd), lambda i, t, s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=spec_bt,
            scratch_shapes=[
                pltpu.VMEM((b * tl, d), jnp.float32),    # h residual
                pltpu.VMEM((b * tl, d), jnp.bfloat16),   # q
                pltpu.VMEM((b * tl, d), jnp.bfloat16),   # k
                pltpu.VMEM((b * tl, d), jnp.bfloat16),   # v
                pltpu.VMEM((b * tl, d), jnp.bfloat16),   # ffn input
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * tl, d), x.dtype),
        # scratch + stage transients exceed the 16 MiB default scoped
        # budget by ~2 MiB at B=2/T=704; v5e VMEM has headroom beyond it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(x_lens.astype(jnp.int32), x.reshape(b * tl, d),
      w_tiles, wb, cos.astype(jnp.bfloat16), sin.astype(jnp.bfloat16),
      perm.astype(jnp.bfloat16))
    return out.reshape(b, tl, d)
