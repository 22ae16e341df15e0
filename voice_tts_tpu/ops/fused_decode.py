"""Fused GPT decode-step megakernel: the whole 24-layer trunk in ONE Pallas call.

Motivation (measured on v5e, see STATUS.md): with int8 weights the per-token
weight DMA is ~0.55 ms but a decode step costs ~1.8 ms — the rest is the
~200 small XLA kernels a 24-layer step lowers to (LayerNorms, reshapes,
cache updates, attention pieces), each a few microseconds of launch/fusion
overhead.  This kernel replaces all of them with a single `pallas_call`
whose grid streams uniform (D, D) int8 weight tiles through VMEM:

    grid = (layers, 12/tpg) — 12 tiles/layer: 3 qkv + 1 attn-proj + 4 mlp-fc
                           + 4 mlp-fc2 (GPT-2 ratios 3D / D / 4D / 4D are
                           fixed, so the tiling is universal); tpg weight
                           tiles ride each grid step (1 by default;
                           `merge_stages` packs 3 or 6 per step to amortize
                           the ~0.2 us fixed per-step cost)

Per grid step Pallas double-buffers the next 1.6 MB int8 tile while the MXU
consumes the current one, so decode runs at the weight-DMA floor.  All
per-layer scalars (12 dequant scales, 12 biases, 4 LN rows) ride in ONE
(28, D) f32 block fetched once per layer — per-grid-step DMA bookkeeping is
just the weight tile.  The residual stream lives in VMEM scratch across the
whole trunk (grid steps on TPU execute sequentially on one core).
Attention (tile 3, right before the attn-proj dot) reads only the live
[0, pos) prefix of the KV cache via manually double-buffered DMA (same
scheme as `ops/decode_attention.py`) and handles the current token's k/v
in-register.

Layout notes (Mosaic constraints): everything stays in flat (.., D) vectors —
no (H, hd) reshapes, which Mosaic cannot shape-cast.  The fused path uses a
time-major cache (L, 2, B, Tmax, D) so block reads are contiguous (BT, D)
tiles; per-head score/context reductions run on the MXU against a constant
0/1 head-grouping matrix (D, H) — lane-group reductions as tiny matmuls
instead of reshapes.  Single-position cache writes can't DMA from inside the
kernel (sublane slices must be 8-aligned), so the kernel RETURNS the new k/v
rows (L, 2, D) and the caller does one XLA `dynamic_update_slice` — in-place
on the loop-carried cache buffer.

Replaces the role DeepSpeed kernel injection plays in the reference
(`indextts/gpt/model_v2.py:433-446`): a fused transformer decode step.

Restriction: batch == 1 (the single-request latency path; batched serving
keeps the XLA path, where weight reads amortize across the batch anyway).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_T = 256          # KV-cache read granularity (time positions)
TILES_PER_LAYER = 12   # 3 (qkv) + 1 (proj) + 4 (fc) + 4 (fc2)


class FusedDecodePack(NamedTuple):
    """Device-resident packed weights for the megakernel (see `pack_gpt`)."""

    w: jnp.ndarray        # (L, 12, D, D) int8
    consts: jnp.ndarray   # (L, 28, D) f32: rows 0-11 dequant scales,
    #                       12-23 biases, 24-27 [ln1.w, ln1.b, ln2.w, ln2.b]


@functools.partial(jax.jit, static_argnames=("layers",))
def pack_gpt(params: Dict[str, Any], layers: int) -> FusedDecodePack:
    """Pack an int8-quantized GPT param tree (`utils.quantize`) into uniform
    (D, D) tiles, stacked (L, 12, D, D).  Runs on device — never pulls the
    ~0.5 GB trunk over the host link."""
    g = params["params"]["gpt"]
    ws, cs = [], []
    for i in range(layers):
        h = g[f"h_{i}"]
        d = h["attn_c_attn"]["weight"].shape[0]

        def col_tiles(m, n):  # (D, n*D) -> (n, D, D) by output columns
            return jnp.transpose(m.reshape(d, n, d), (1, 0, 2))

        qkv, proj = h["attn_c_attn"], h["attn_c_proj"]
        fc, fc2 = h["mlp_c_fc"], h["mlp_c_proj"]
        ws.append(jnp.concatenate([
            col_tiles(qkv["weight"], 3),
            proj["weight"][None],
            col_tiles(fc["weight"], 4),
            fc2["weight"].reshape(4, d, d),          # row tiles (contraction)
        ]))

        def rows(v, n):  # (1, n*D) or (n*D,) -> (n, D) f32
            return v.reshape(n, d).astype(jnp.float32)

        scales = jnp.concatenate([
            rows(qkv["scale"], 3), rows(proj["scale"], 1),
            rows(fc["scale"], 4),
            jnp.broadcast_to(fc2["scale"].reshape(1, d).astype(jnp.float32),
                             (4, d)),                # shared across row tiles
        ])
        biases = jnp.concatenate([
            rows(qkv["bias"], 3), rows(proj["bias"], 1),
            rows(fc["bias"], 4),
            jnp.zeros((3, d), jnp.float32),          # partials: bias once,
            rows(fc2["bias"], 1),                    # on the last tile
        ])
        lns = jnp.stack([
            h["ln_1"]["weight"], h["ln_1"]["bias"],
            h["ln_2"]["weight"], h["ln_2"]["bias"]]).astype(jnp.float32)
        cs.append(jnp.concatenate([scales, biases, lns]))
    return FusedDecodePack(jnp.stack(ws), jnp.stack(cs))


class FusedDecodePackInt4(NamedTuple):
    """int4 weight-only pack: nibble-packed tiles + group-wise scales.

    Halves the per-token weight DMA vs int8 (`pack_gpt`); measured 1.33x on
    tile streaming (the in-kernel unpack costs VPU time).  Quantization is
    RTN with one scale per 128 contraction rows per output channel (g128),
    computed from the ORIGINAL f32 weights.
    """

    w: jnp.ndarray        # (L, 12, D/2, D) int8: lo nibble rows [0,D/2),
    #                       hi nibble rows [D/2, D) of the logical tile
    consts: jnp.ndarray   # (L, 28, D) f32: rows 0-11 unused, 12-23 biases,
    #                       24-27 LN rows (same layout as FusedDecodePack)
    gscales: jnp.ndarray  # (L, 12, G, D) f32, G = D // 128 scale groups


GROUP = 128


def group_size(d: int) -> int:
    """Scale-group width along the contraction dim: 128, shrunk so each
    packed half (d/2 rows) holds a whole number of groups on tiny configs."""
    return min(GROUP, d // 2)


@functools.partial(jax.jit, static_argnames=("layers", "group"))
def pack_gpt_int4(params: Dict[str, Any], layers: int,
                  group: int = 0) -> FusedDecodePackInt4:
    """Pack the f32 GPT trunk into grouped int4 tiles (device-side, jitted).

    `group` is the scale-group width along the contraction dim (0 = the
    g128 default).  Wider groups trade quantization granularity for MXU
    efficiency: the kernel's per-group sub-dots contract K=group lanes, and
    K=64 dots run the MXU at half rate — group = d//2 (G=2) makes each half
    ONE dense full-rate dot.  The int4 quality gate
    (`scripts/int4_quality.py`) quantifies the quality side."""
    g = params["params"]["gpt"]
    ws, cs, ss = [], [], []
    for i in range(layers):
        h = g[f"h_{i}"]
        d = h["attn_c_attn"]["weight"].shape[0]
        gsz = group or group_size(d)
        assert d // 2 % gsz == 0 or gsz == d // 2, (
            f"group {gsz} must divide the packed half {d // 2}")
        ng = d // gsz

        def col_tiles(m, n):
            return jnp.transpose(m.reshape(d, n, d), (1, 0, 2))

        qkv, proj = h["attn_c_attn"], h["attn_c_proj"]
        fc, fc2 = h["mlp_c_fc"], h["mlp_c_proj"]
        tiles = jnp.concatenate([
            col_tiles(qkv["weight"].astype(jnp.float32), 3),
            proj["weight"].astype(jnp.float32)[None],
            col_tiles(fc["weight"].astype(jnp.float32), 4),
            fc2["weight"].astype(jnp.float32).reshape(4, d, d),
        ])                                                  # (12, D, D)
        grouped = tiles.reshape(12, ng, gsz, d)
        scale = jnp.max(jnp.abs(grouped), axis=2) / 7.0     # (12, G, D)
        scale = jnp.maximum(scale, 1e-12)
        q = jnp.clip(jnp.round(grouped / scale[:, :, None, :]), -8, 7)
        q = q.reshape(12, d, d).astype(jnp.int32)
        packed = ((q[:, :d // 2] & 15)
                  | ((q[:, d // 2:] & 15) << 4)).astype(jnp.int8)
        ws.append(packed)
        ss.append(scale)

        def rows(v, n):
            return v.reshape(n, d).astype(jnp.float32)

        biases = jnp.concatenate([
            rows(qkv["bias"], 3), rows(proj["bias"], 1),
            rows(fc["bias"], 4),
            jnp.zeros((3, d), jnp.float32),
            rows(fc2["bias"], 1),
        ])
        lns = jnp.stack([
            h["ln_1"]["weight"], h["ln_1"]["bias"],
            h["ln_2"]["weight"], h["ln_2"]["bias"]]).astype(jnp.float32)
        cs.append(jnp.concatenate([jnp.zeros((12, d), jnp.float32),
                                   biases, lns]))
    return FusedDecodePackInt4(jnp.stack(ws), jnp.stack(cs), jnp.stack(ss))


class ReadoutPack(NamedTuple):
    """Folded final_norm + mel_head readout for the decode megakernel.

    The XLA readout costs ~32 us/step on v5e (21 MB bf16 mel_head DMA +
    launch overhead — STATUS r3 decomposition: trunk 0.709 -> +readout
    0.741 ms/token).  Folding it into the kernel's grid streams the head as
    int8 tiles through the same double-buffered pipeline (half the bytes,
    zero extra launches).  Numerics: hidden is LN'd in f32 then cast bf16
    for int8-dequant dots — a quantization delta on LOGITS only, measured
    by the quality gate alongside the trunk's int8 delta.
    """

    w: jnp.ndarray       # (12, D, VT) int8 — mel_head columns, tile-major
    consts: jnp.ndarray  # (12, 2, VT) f32 rows: [dequant scale; bias]
    lnf: jnp.ndarray     # (2, D) f32: final_norm [weight; bias]


RO_TILES = 12  # readout column tiles == one trunk layer's tile count


@jax.jit
def pack_readout(params: Dict[str, Any]) -> ReadoutPack:
    """Pack final_norm + mel_head from a UnifiedVoice param tree into int8
    column tiles (per-output-channel symmetric scales).  The vocab axis is
    zero-padded to 12 lane-aligned tiles; padded columns carry scale 0 /
    bias 0, and callers slice logits back to the true vocab."""
    g = params["params"]
    w = g["mel_head"]["weight"].astype(jnp.float32)     # (V, D) torch layout
    b = g["mel_head"]["bias"].astype(jnp.float32)
    v, d = w.shape
    vt = -(-v // (RO_TILES * 128)) * 128                # cols per tile
    wt = jnp.zeros((d, RO_TILES * vt), jnp.float32).at[:, :v].set(w.T)
    bias = jnp.zeros((RO_TILES * vt,), jnp.float32).at[:v].set(b)
    amax = jnp.max(jnp.abs(wt), axis=0)
    scale = jnp.where(amax > 0, jnp.maximum(amax, 1e-8) / 127.0, 0.0)
    q = jnp.clip(jnp.round(jnp.where(scale > 0, wt / jnp.maximum(scale, 1e-30),
                                     0.0)),
                 -127, 127).astype(jnp.int8)
    w_tiles = jnp.transpose(q.reshape(d, RO_TILES, vt), (1, 0, 2))
    consts = jnp.stack([scale.reshape(RO_TILES, vt),
                        bias.reshape(RO_TILES, vt)], axis=1)
    lnf = jnp.stack([g["final_norm"]["weight"],
                     g["final_norm"]["bias"]]).astype(jnp.float32)
    return ReadoutPack(w_tiles, consts, lnf)


def cache_to_time_major(kv_cache: jnp.ndarray) -> jnp.ndarray:
    """(L, 2, B, H, hd, T) [XLA decode layout] -> (L, 2, B, T, H*hd)."""
    l, _, b, h, hd, t = kv_cache.shape
    return jnp.transpose(kv_cache, (0, 1, 2, 5, 3, 4)).reshape(
        l, 2, b, t, h * hd)


def quantize_kv_cache(tm_cache: jnp.ndarray):
    """Per-position symmetric int8 quantization of a time-major cache.

    tm_cache (L, 2, 1, T, D) float -> (int8 cache same shape,
    scales (L, T, 2) f32) with dequant = q * scale.  One scale per
    (layer, position, k-or-v) row — the standard production KV8 scheme;
    halves the decode loop's cache DMA, which grows linearly with the
    prefix while the weight traffic stays flat.
    """
    s = jnp.max(jnp.abs(tm_cache.astype(jnp.float32)), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-12)                     # (L, 2, 1, T)
    q = jnp.round(tm_cache.astype(jnp.float32) / s[..., None])
    q = jnp.clip(q, -127, 127).astype(jnp.int8)
    return q, jnp.transpose(s[:, :, 0, :], (0, 2, 1))


def quantize_kv_rows(kv_new: jnp.ndarray):
    """(L, 2, D) f32 new-token rows -> (int8 rows, scales (L, 2) f32)."""
    s = jnp.maximum(jnp.max(jnp.abs(kv_new), axis=-1) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(kv_new / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def _ln(x, w, b, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


def _dot_one_tile(src, w_tile, scale_row, bias_row, gs_rows,
                  int4_groups, int4_expand):
    """(1, D) @ one weight tile, dequant + bias in-register -> f32.

    int8: one bf16 dot; `scale_row`/`bias_row` are (1, D) rows of c_ref.
    int4: `w_tile` is (D/2, D) nibble-packed (low nibble = contraction rows
    [0, D/2), high = [D/2, D)); `gs_rows` is the (G, D) group-scale block.
    Three dequant schemes via `int4_expand`: False = i32-mask unpack +
    per-group sub-dots; True = MXU-expanded whole-tile dequant; "i8sh" =
    int8-lane shift unpack (identical nibble values to False — the sign
    extension happens inside the 8-bit lanes) + the same per-group sub-dots.
    """
    d = w_tile.shape[-1]
    if not int4_groups:
        y = jnp.dot(src.astype(jnp.bfloat16), w_tile.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return y * scale_row + bias_row
    half = d // 2
    per_half = int4_groups // 2
    gsize = half // per_half
    xb = src.astype(jnp.bfloat16)
    if int4_expand == "i8sh":
        # 8-bit-lane unpack with NO int8 arithmetic beyond two bitwise ANDs:
        # Mosaic legalizes neither arith.shli/subi on i8 vectors nor
        # arith.cmpf on bf16 ("failed to legalize operation", COMPILE_GATE
        # round-3), so the sign-extension is compare-free bf16 math after
        # the lane-width convert — every value is a small integer, so it
        # is exact:
        #   lo_u = w & 15,  bit3 = w & 8       (the only i8 ops)
        #   lo   = lo_u - 2*bit3               (sign-extend: -16 iff bit3=8)
        #   w - lo_u = 16*hi exactly (range [-128, 112]), so
        #   hi   = (w - lo_u) * 2^-4           (power-of-two scale: exact)
        # vs the default "group" scheme this never widens the (D/2, D)
        # tile to i32 (4x the registers) — bf16 is the widest it gets.
        lo_u = (w_tile & jnp.int8(15)).astype(jnp.bfloat16)
        bit3 = (w_tile & jnp.int8(8)).astype(jnp.bfloat16)
        lo = lo_u - (bit3 + bit3)
        hi = (w_tile.astype(jnp.bfloat16) - lo_u) * jnp.bfloat16(0.0625)
        y = jnp.zeros((src.shape[0], d), jnp.float32)
        for g in range(per_half):
            sl = slice(g * gsize, (g + 1) * gsize)
            y += (jnp.dot(xb[:, g * gsize:(g + 1) * gsize], lo[sl],
                          preferred_element_type=jnp.float32)
                  * gs_rows[g:g + 1])
            y += (jnp.dot(xb[:, half + g * gsize:half + (g + 1) * gsize],
                          hi[sl], preferred_element_type=jnp.float32)
                  * gs_rows[per_half + g:per_half + g + 1])
        return y + bias_row
    wb = w_tile.astype(jnp.int32)                      # (D/2, D) packed
    if int4_expand:
        # dequantize the whole tile: expand the (G, D) group scales to
        # (D/2, D) rows via an MXU dot with a constant 0/1 expansion
        # matrix, fold into the unpacked nibbles, then TWO dense K=D/2
        # dots (fewer, larger MXU passes than the per-group sub-dots at
        # the cost of the (D/2, D) elementwise scale multiply)
        lo = (((wb & 15) ^ 8) - 8).astype(jnp.float32)
        hi = jax.lax.shift_right_arithmetic(wb, 4).astype(jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (half, per_half), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (half, per_half), 1)
        e = (rows // gsize == cols).astype(jnp.float32)
        slo = jnp.dot(e, gs_rows[:per_half],
                      preferred_element_type=jnp.float32)
        shi = jnp.dot(e, gs_rows[per_half:],
                      preferred_element_type=jnp.float32)
        y = (jnp.dot(xb[:, :half], (lo * slo).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
             + jnp.dot(xb[:, half:], (hi * shi).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32))
        return y + bias_row
    lo = (((wb & 15) ^ 8) - 8).astype(jnp.bfloat16)
    hi = jax.lax.shift_right_arithmetic(wb, 4).astype(jnp.bfloat16)
    y = jnp.zeros((src.shape[0], d), jnp.float32)
    for g in range(per_half):
        sl = slice(g * gsize, (g + 1) * gsize)
        y += (jnp.dot(xb[:, g * gsize:(g + 1) * gsize], lo[sl],
                      preferred_element_type=jnp.float32)
              * gs_rows[g:g + 1])
        y += (jnp.dot(xb[:, half + g * gsize:half + (g + 1) * gsize],
                      hi[sl], preferred_element_type=jnp.float32)
              * gs_rows[per_half + g:per_half + g + 1])
    return y + bias_row


def _attend(layer, pos, heads, d, q_in, k_cur, v_cur, bias_ref, hmask_ref,
            hmask_t_ref, cache_ref, kscale_ref, kbuf, vbuf, sem_k, sem_v,
            int8_kv):
    """Online-softmax attention over the [0, pos) cache prefix + the current
    token's in-VMEM k/v.  Cache blocks stream through the 2-slot kbuf/vbuf
    double buffer (block 0's DMA must already be in flight).  Returns the
    (1, D) context."""
    hd = d // heads
    hmask = hmask_ref[...]        # (D, H) 0/1: lane -> head grouping
    hmask_t = hmask_t_ref[...]    # (H, D)
    q = q_in * (hd ** -0.5)       # (1, D) f32
    n_blocks = pl.cdiv(pos, BLOCK_T)

    def dma_k(j, slot):
        return pltpu.make_async_copy(
            cache_ref.at[layer, 0, 0, pl.ds(j * BLOCK_T, BLOCK_T), :],
            kbuf.at[slot], sem_k.at[slot])

    def dma_v(j, slot):
        return pltpu.make_async_copy(
            cache_ref.at[layer, 1, 0, pl.ds(j * BLOCK_T, BLOCK_T), :],
            vbuf.at[slot], sem_v.at[slot])

    def head_sum(x):    # (N, D) -> (N, H): reduce lanes within each head
        return jnp.dot(x, hmask, preferred_element_type=jnp.float32)

    def head_bcast(x):  # (N, H) -> (N, D): repeat per-head scalars
        return jnp.dot(x, hmask_t, preferred_element_type=jnp.float32)

    def step(j, carry):
        m, l, acc = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_blocks)
        def _():
            nxt = jax.lax.rem(j + 1, 2)
            dma_k(j + 1, nxt).start()
            dma_v(j + 1, nxt).start()

        dma_k(j, slot).wait()
        t0 = j * BLOCK_T
        k = kbuf[slot].astype(jnp.float32)            # (BT, D)
        if int8_kv:
            k = k * kscale_ref[0, pl.ds(t0, BLOCK_T), 0:1]
        scores = head_sum(q * k)                      # (BT, H)
        scores = scores + bias_ref[pl.ds(t0, BLOCK_T), :]
        row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_T, heads), 0) + t0
        scores = jnp.where(row < pos, scores, -jnp.inf)

        m_new = jnp.maximum(m, jnp.max(scores, axis=0, keepdims=True))
        alpha = jnp.exp(m - m_new)                    # (1, H)
        p = jnp.exp(scores - m_new)                   # (BT, H)
        l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)

        dma_v(j, slot).wait()
        v = vbuf[slot].astype(jnp.float32)            # (BT, D)
        if int8_kv:
            v = v * kscale_ref[0, pl.ds(t0, BLOCK_T), 1:2]
        pv = jnp.sum(head_bcast(p) * v, axis=0, keepdims=True)  # (1, D)
        acc_new = acc * head_bcast(alpha) + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((1, heads), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((1, heads), jnp.float32)
    a0 = jnp.zeros((1, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, step, (m0, l0, a0))

    # current token (always attendable; its k/v live in VMEM)
    s_cur = head_sum(q * k_cur)                       # (1, H)
    m_f = jnp.maximum(m, s_cur)
    alpha = jnp.exp(m - m_f)
    p_cur = jnp.exp(s_cur - m_f)
    l_f = l * alpha + p_cur
    ctx = (acc * head_bcast(alpha) + head_bcast(p_cur) * v_cur)
    return ctx / head_bcast(l_f)                      # (1, D)


def _kernel_merged(pos_ref, x_ref, w_ref, c_ref, *rest, heads, skip_attn,
                   int4_groups, int4_expand, int8_kv, tpg, readout=False):
    """`tpg`-tiles-per-program variant of `_kernel`: grid (L, 12/tpg).
    Measured per-tile streaming carries ~0.2 us of fixed per-grid-step cost
    (scripts/micro_tile.py: 2.21 vs 2.0 us/tile ideal at int8); merging
    amortizes it `tpg`x while Pallas still double-buffers the (now
    multi-tile) weight block.  Tile order and numerics are identical to the
    unmerged kernel — the per-tile actions below run in tile order within
    each group, which respects every data dependency (attention runs right
    before the proj tile; ln2 right after the proj residual add).
    """
    rest = list(rest)
    gs_ref = rest.pop(0) if int4_groups else None
    bias_ref, hmask_ref, hmask_t_ref, cache_ref = rest[:4]
    rest = rest[4:]
    kscale_ref = rest.pop(0) if int8_kv else None
    ro_w_ref = rest.pop(0) if readout else None
    ro_c_ref = rest.pop(0) if readout else None
    lnf_ref = rest.pop(0) if readout else None
    y_ref, kv_ref = rest[0], rest[1]
    rest = rest[2:]
    logits_ref = rest.pop(0) if readout else None
    (x_s, ln_s, q_s, k_s, v_s, h_s, acc_s, kbuf, vbuf,
     sem_k, sem_v) = rest
    layer = pl.program_id(0)
    g = pl.program_id(1)
    # with the folded readout the grid carries one extra "layer" whose tile
    # slots stream the mel_head column tiles instead of trunk weights
    n_layers = pl.num_programs(0) - (1 if readout else 0)
    d = x_ref.shape[1]
    pos = pos_ref[0]

    def dot(src, t_global):
        j = t_global % tpg
        return _dot_one_tile(
            src, w_ref[0, j], c_ref[0, pl.ds(t_global, 1)],
            c_ref[0, pl.ds(t_global + 12, 1)],
            gs_ref[0, j] if int4_groups else None,
            int4_groups, int4_expand)

    def action(t):
        """The unmerged kernel's stage-t work (same order, same math)."""
        if t == 0:
            @pl.when(layer == 0)
            def _():
                x_s[...] = x_ref[...].astype(jnp.float32)
            ln_s[...] = _ln(x_s[...], c_ref[0, 24:25], c_ref[0, 25:26])
            if not skip_attn:
                pltpu.make_async_copy(
                    cache_ref.at[layer, 0, 0, pl.ds(0, BLOCK_T), :],
                    kbuf.at[0], sem_k.at[0]).start()
                pltpu.make_async_copy(
                    cache_ref.at[layer, 1, 0, pl.ds(0, BLOCK_T), :],
                    vbuf.at[0], sem_v.at[0]).start()
            q_s[...] = dot(ln_s[...], 0)
        elif t == 1:
            k = dot(ln_s[...], 1)
            k_s[...] = k
            kv_ref[0, 0] = k[0].astype(kv_ref.dtype)
        elif t == 2:
            v = dot(ln_s[...], 2)
            v_s[...] = v
            kv_ref[0, 1] = v[0].astype(kv_ref.dtype)
        elif t == 3:
            if skip_attn:
                ctx = v_s[...] * 1e-3
            else:
                ctx = _attend(layer, pos, heads, d, q_s[...], k_s[...],
                              v_s[...], bias_ref, hmask_ref, hmask_t_ref,
                              cache_ref, kscale_ref, kbuf, vbuf, sem_k,
                              sem_v, int8_kv)
            x_s[...] = x_s[...] + dot(ctx, 3)
            ln_s[...] = _ln(x_s[...], c_ref[0, 26:27], c_ref[0, 27:28])
        elif t in (4, 5, 6, 7):
            h_s[t - 4:t - 3] = jax.nn.gelu(dot(ln_s[...], t),
                                           approximate=True)
        else:  # 8..11: down-projection partials over the h_s row tiles
            part = dot(h_s[t - 8:t - 7], t)
            if t == 8:
                acc_s[...] = part
            else:
                acc_s[...] = acc_s[...] + part
            if t == 11:
                x_s[...] = x_s[...] + acc_s[...]

                @pl.when(layer == n_layers - 1)
                def _():
                    y_ref[...] = x_s[...]

    for grp in range(TILES_PER_LAYER // tpg):
        trunk_here = (g == grp) if not readout else ((g == grp)
                                                     & (layer < n_layers))

        @pl.when(trunk_here)
        def _(grp=grp):
            for j in range(tpg):
                action(grp * tpg + j)

    if readout:
        # extra grid "layer": stream the int8 mel_head tiles and emit
        # logits — final_norm once (g == 0), then tpg dequant dots per step
        @pl.when(layer == n_layers)
        def _():
            @pl.when(g == 0)
            def _():
                ln_s[...] = _ln(x_s[...], lnf_ref[0:1], lnf_ref[1:2])
            src = ln_s[...].astype(jnp.bfloat16)
            for j in range(tpg):
                yv = jnp.dot(src, ro_w_ref[0, j].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
                logits_ref[0, j] = (yv * ro_c_ref[0, j, 0:1]
                                    + ro_c_ref[0, j, 1:2])[0]


@functools.partial(jax.jit,
                   static_argnames=("heads", "interpret", "skip_attn",
                                    "int4_expand", "merge_stages"))
def fused_decode_step(x: jnp.ndarray, pack: FusedDecodePack,
                      kv_cache: jnp.ndarray, bias: jnp.ndarray,
                      pos: jnp.ndarray, heads: int,
                      interpret: bool = False, skip_attn: bool = False,
                      kv_scales: jnp.ndarray = None,
                      int4_expand: bool = False,
                      merge_stages: bool | int = False,
                      readout_pack: ReadoutPack = None):
    """One full trunk step.  x (1, D) token embedding; kv_cache TIME-MAJOR
    (L, 2, 1, Tmax, D) (see `cache_to_time_major`) with Tmax % BLOCK_T == 0;
    bias (Tmax, 1) f32 additive mask over cache positions; pos scalar — the
    index of the current token (positions [0, pos) are live history).

    Returns (hidden (1, D) f32 pre-ln_f, kv_new (L, 2, D)).  The caller must
    write kv_new into the cache at [.., pos, :] (one dynamic_update_slice).
    `skip_attn` replaces attention with a stub — perf-debug only.

    int8 KV: pass an int8 `kv_cache` plus `kv_scales` (L, Tmax, 2) f32
    (see `quantize_kv_cache`); the attention stage dequantizes each cache
    block in VMEM (half the per-step cache DMA).  kv_new comes back f32 —
    quantize with `quantize_kv_rows` before `apply_kv_update_q`.

    `merge_stages`: run several weight tiles per grid step (True == 3;
    or an int in {3, 6}, grid (L, 12/tpg), see `_kernel_merged`) — same
    numerics, proportionally less fixed per-grid-step overhead; VMEM
    holds a double-buffered tpg-tile block (int8 D=1280 tpg=3: ~9.8 MB
    of ~16 MB/core; tpg=6 only fits the nibble-packed int4 tiles).
    """
    l, _, b, t_max, d = kv_cache.shape
    int8_kv = kv_scales is not None
    assert b == 1 and d % heads == 0 and x.shape == (1, d)
    assert t_max % BLOCK_T == 0, "cache length must be a multiple of BLOCK_T"
    assert bias.shape == (t_max, 1)
    assert not int8_kv or (kv_cache.dtype == jnp.int8
                           and kv_scales.shape == (l, t_max, 2))

    hmask = (jnp.arange(d)[:, None] // (d // heads)
             == jnp.arange(heads)[None, :]).astype(jnp.float32)

    int4 = isinstance(pack, FusedDecodePackInt4)
    # derive the group count from the pack itself (supports any width)
    int4_groups = pack.gscales.shape[2] if int4 else 0
    w_rows = d // 2 if int4 else d
    # weight tiles per grid step (True == 3 for backward compat)
    if int4_expand not in (False, True, "i8sh"):
        raise ValueError(f"int4_expand must be False, True, or 'i8sh', "
                         f"got {int4_expand!r}")
    tpg = (3 if merge_stages is True else int(merge_stages)) or 1
    if tpg not in (1, 3, 6):
        raise ValueError(
            f"merge_stages must be one of 0/False (one tile per step), 3, "
            f"or 6, got {merge_stages!r}")
    ro = readout_pack is not None
    n_grid_layers = l + (1 if ro else 0)
    gg = TILES_PER_LAYER // tpg
    if ro:
        # during the readout layer the trunk inputs pin to their final
        # block (same index as the previous grid step -> NO refetch; the
        # kernel never reads them there)
        def w_idx(i, t, s):
            return (jnp.minimum(i, l - 1),
                    jnp.where(i >= l, gg - 1, t), 0, 0)

        def c_idx(i, t, s):
            return (jnp.minimum(i, l - 1), 0, 0)
    else:
        def w_idx(i, t, s):
            return (i, t, 0, 0)

        def c_idx(i, t, s):
            return (i, 0, 0)
    in_specs = [
        pl.BlockSpec((1, d), lambda i, t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tpg, w_rows, d), w_idx,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 28, d), c_idx,
                     memory_space=pltpu.VMEM),
    ]
    if int4:
        in_specs.append(
            pl.BlockSpec((1, tpg, int4_groups, d), w_idx,
                         memory_space=pltpu.VMEM))
    in_specs += [
        pl.BlockSpec((t_max, 1), lambda i, t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, heads), lambda i, t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, d), lambda i, t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),            # kv cache (HBM)
    ]
    if int8_kv:
        in_specs.append(
            pl.BlockSpec((1, t_max, 2), c_idx,
                         memory_space=pltpu.VMEM))    # per-layer kv scales
    extra_args = []
    if ro:
        assert readout_pack.w.shape[0] == RO_TILES
        vt = readout_pack.w.shape[2]

        def ro_idx(i, t, s):
            return (jnp.where(i >= l, t, 0), 0, 0, 0)

        in_specs += [
            pl.BlockSpec((1, tpg, d, vt),
                         lambda i, t, s: (jnp.where(i >= l, t, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpg, 2, vt),
                         lambda i, t, s: (jnp.where(i >= l, t, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d), lambda i, t, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        extra_args = [readout_pack.w.reshape(gg, tpg, d, vt),
                      readout_pack.consts.reshape(gg, tpg, 2, vt),
                      readout_pack.lnf]
    out_specs = [
        pl.BlockSpec((1, d), lambda i, t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, d), c_idx,
                     memory_space=pltpu.VMEM),        # per-layer new k/v
    ]
    if ro:
        out_specs.append(
            pl.BlockSpec((1, tpg, vt),
                         lambda i, t, s: (jnp.where(i >= l, t, 0), 0, 0),
                         memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_grid_layers, gg),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),          # x_s residual
            pltpu.VMEM((1, d), jnp.float32),          # ln_s
            pltpu.VMEM((1, d), jnp.float32),          # q_s
            pltpu.VMEM((1, d), jnp.float32),          # k_s
            pltpu.VMEM((1, d), jnp.float32),          # v_s
            pltpu.VMEM((4, d), jnp.float32),          # h_s mlp activations
            pltpu.VMEM((1, d), jnp.float32),          # acc_s
            pltpu.VMEM((2, BLOCK_T, d), kv_cache.dtype),  # kbuf
            pltpu.VMEM((2, BLOCK_T, d), kv_cache.dtype),  # vbuf
            pltpu.SemaphoreType.DMA((2,)),            # sem_k
            pltpu.SemaphoreType.DMA((2,)),            # sem_v
        ],
    )
    kernel = functools.partial(
        _kernel_merged, heads=heads, skip_attn=skip_attn,
        int4_groups=int4_groups, int4_expand=int4_expand,
        int8_kv=int8_kv, tpg=tpg, readout=ro)
    args = [jnp.asarray([pos], jnp.int32), x.astype(jnp.float32),
            pack.w, pack.consts]
    if int4:
        args.append(pack.gscales)
    args += [bias, hmask, jnp.transpose(hmask), kv_cache]
    if int8_kv:
        args.append(kv_scales)
    args += extra_args
    kv_new_dtype = jnp.float32 if int8_kv else kv_cache.dtype
    out_shapes = [
        jax.ShapeDtypeStruct((1, d), jnp.float32),
        jax.ShapeDtypeStruct((l, 2, d), kv_new_dtype),
    ]
    if ro:
        out_shapes.append(jax.ShapeDtypeStruct((gg, tpg, vt), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        # merge_stages=6 with int8 tiles double-buffers ~19.7 MB of weights
        # — above the 16 MiB default scoped budget (int4 m6 fit; int8 m6
        # previously "VMEM" — now allowed, A/B'd like every grid variant)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if ro:
        y, kv_new, logits = outs
        # tile-major (gg, tpg, vt) -> one (1, 12*vt) row; padded columns
        # carry zeros — the caller slices [:, :vocab]
        return y, kv_new, logits.reshape(1, RO_TILES * vt)
    y, kv_new = outs
    return y, kv_new


def batch_block_t(b: int) -> int:
    """KV-read block length for the batched kernel: keep the double-buffered
    K+V slabs at ~<=512 total (batch x time) rows (~5 MB bf16 at D=1280),
    within [64, BLOCK_T].  Every value divides BLOCK_T, so the caller's
    Tmax % BLOCK_T == 0 rounding keeps working."""
    bt = 64
    while bt * 2 * b <= 512 and bt * 2 <= BLOCK_T:
        bt *= 2
    return bt


def _attend_batch(layer, scal_ref, heads, d, bt, q_in, k_cur, v_cur,
                  hmask_ref, hmask_t_ref, cache_ref, kscale_ref, src_ref,
                  kbuf, vbuf, sem_k, sem_v, int8_kv, beam_k=0):
    """Batched online-softmax attention over each row's [0, pos_b) cache
    prefix plus its current-token k/v (in VMEM).  One strided DMA per block
    moves the (B, BT, D) slab for all rows at once (B contiguous BT*D
    chunks), covering ceil(max_b pos_b / BT) blocks; rows past their own
    pos_b are masked.  scal_ref is the (3, B) scalar-prefetch: row 0 live
    prefix lengths (continuous batching steps rows at different positions),
    rows 1-2 the per-row invalid prompt-padding interval [lo_b, hi_b) —
    interval scalars instead of an additive (B, Tmax) bias because the bias
    window read `bias_ref[:, pl.ds(j*bt, bt)]` is a LANE-dim dynamic slice,
    which Mosaic rejects unless the offset is a provable multiple of 128
    (bt = 64 at B >= 5: "cannot statically prove that index in dimension 1
    is a multiple of 128" — every round-2 serving A/B died there).

    src_ref (B, Tmax) i32 VMEM, beam decode only (else None): the ancestor
    table — position t of row b's hypothesis lives in cache row
    src_ref[b, t].  Beam search never physically reorders the cache (the HF
    `_reorder_cache` gather moves the WHOLE padded cache through HBM twice
    per token — measured 3.7x the greedy step cost at serving shapes);
    instead the slab already holds all B rows, and each row selects its
    ancestor's k/v in-register.  Requires bt % 128 == 0 (lane-dim window
    reads of the table), which `fused_decode_step_batch` forces whenever a
    table is present.

    `beam_k` > 0 marks REQUEST-BATCHED beam decode: B = R*beam_k rows where
    rows [r*K, (r+1)*K) are one request's K beams.  Ancestors never cross a
    request boundary (the caller's tables only contain in-group row ids),
    so the selection loop shrinks from B masked adds over the full (B, BT,
    D) slab to K per group over its (K, BT, D) sub-slab — O(B*K) instead of
    O(B^2) VPU work.  Returns the (B, D) context."""
    b = q_in.shape[0]
    hd = d // heads
    hmask = hmask_ref[...]        # (D, H) 0/1: lane -> head grouping
    hmask_t = hmask_t_ref[...]    # (H, D)
    q = q_in * (hd ** -0.5)       # (B, D) f32
    max_pos = scal_ref[0, 0]
    for i in range(1, b):
        max_pos = jnp.maximum(max_pos, scal_ref[0, i])
    # per-row scalars as (B, BT, H) operands built from SMEM values via
    # 2D fulls: Mosaic cannot lower a (B,) -> (B,1,1) vector shape cast
    # ("infer-vector-layout: unsupported shape cast" on real libtpu)
    def col(r):
        return jnp.stack([jnp.full((bt, heads), scal_ref[r, i],
                                   dtype=jnp.int32) for i in range(b)])
    pos_col, lo_col, hi_col = col(0), col(1), col(2)
    n_blocks = pl.cdiv(max_pos, bt)

    def ancestor(slab, t0):
        """(B, BT, D) dequantized slab -> each row's ancestor view.
        f32 one-hot multiply-add, not a boolean select: Mosaic cannot
        reshape i1 vectors ((B, BT) -> (B, BT, 1) fails to legalize)."""
        srcw = src_ref[:, pl.ds(t0, bt)]              # (B, BT) i32
        if beam_k and beam_k < b:
            # request groups: row g*K+j only ever selects within its group
            groups = []
            for g0 in range(0, b, beam_k):
                srcg = srcw[g0:g0 + beam_k]           # (K, BT) i32
                sub = jnp.zeros_like(slab[g0:g0 + beam_k])
                for j in range(beam_k):
                    m = jnp.where(srcg == g0 + j, 1.0, 0.0)
                    sub = sub + m[:, :, None] * slab[g0 + j][None]
                groups.append(sub)
            return jnp.concatenate(groups, axis=0)
        out = jnp.zeros_like(slab)
        for b2 in range(b):
            m = jnp.where(srcw == b2, 1.0, 0.0)       # (B, BT) f32
            out = out + m[:, :, None] * slab[b2][None]
        return out

    def dma_k(j, slot):
        return pltpu.make_async_copy(
            cache_ref.at[layer, 0, :, pl.ds(j * bt, bt), :],
            kbuf.at[slot], sem_k.at[slot])

    def dma_v(j, slot):
        return pltpu.make_async_copy(
            cache_ref.at[layer, 1, :, pl.ds(j * bt, bt), :],
            vbuf.at[slot], sem_v.at[slot])

    def head_sum(x):    # (N, D) -> (N, H): reduce lanes within each head
        return jnp.dot(x, hmask, preferred_element_type=jnp.float32)

    def head_bcast(x):  # (N, H) -> (N, D): repeat per-head scalars
        return jnp.dot(x, hmask_t, preferred_element_type=jnp.float32)

    def step(j, carry):
        m, l, acc = carry         # (B, H), (B, H), (B, D)
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_blocks)
        def _():
            nxt = jax.lax.rem(j + 1, 2)
            dma_k(j + 1, nxt).start()
            dma_v(j + 1, nxt).start()

        dma_k(j, slot).wait()
        t0 = j * bt
        k = kbuf[slot].astype(jnp.float32)            # (B, BT, D)
        if int8_kv:
            # dequantize with each SOURCE row's scale before any ancestor
            # selection, so selected values carry the right scale
            k = k * kscale_ref[0, :, pl.ds(t0, bt), 0:1]
        if src_ref is not None:
            k = ancestor(k, t0)
        scores = head_sum((q[:, None, :] * k).reshape(b * bt, d))
        scores = scores.reshape(b, bt, heads)
        row = jax.lax.broadcasted_iota(jnp.int32, (b, bt, heads), 1) + t0
        keep = (row < pos_col) & ((row < lo_col) | (row >= hi_col))
        scores = jnp.where(keep, scores, -jnp.inf)

        m_new = jnp.maximum(m, jnp.max(scores, axis=1))
        # safe max: a row whose whole prefix precedes this block span keeps
        # m_new = -inf (every score masked); subtract 0 there so exp gives
        # exact zeros instead of inf-inf NaNs (pos_b = 0 idle slots included)
        m_safe = jnp.where(m_new == -jnp.inf, 0.0, m_new)
        alpha = jnp.exp(m - m_safe)                   # (B, H)
        p = jnp.exp(scores - m_safe[:, None, :])      # (B, BT, H)
        l_new = l * alpha + jnp.sum(p, axis=1)

        dma_v(j, slot).wait()
        v = vbuf[slot].astype(jnp.float32)            # (B, BT, D)
        if int8_kv:
            v = v * kscale_ref[0, :, pl.ds(t0, bt), 1:2]
        if src_ref is not None:
            v = ancestor(v, t0)
        pb = head_bcast(p.reshape(b * bt, heads)).reshape(b, bt, d)
        pv = jnp.sum(pb * v, axis=1)                  # (B, D)
        acc_new = acc * head_bcast(alpha) + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((b, heads), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, heads), jnp.float32)
    a0 = jnp.zeros((b, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, step, (m0, l0, a0))

    # current token (always attendable; its k/v live in VMEM)
    s_cur = head_sum(q * k_cur)                       # (B, H)
    m_f = jnp.maximum(m, s_cur)
    alpha = jnp.exp(m - m_f)
    p_cur = jnp.exp(s_cur - m_f)
    l_f = l * alpha + p_cur
    ctx = (acc * head_bcast(alpha) + head_bcast(p_cur) * v_cur)
    return ctx / head_bcast(l_f)                      # (B, D)


def _attend_verify(layer, scal_ref, heads, d, bt, q_in, k_cur, v_cur,
                   hmask_ref, hmask_t_ref, cache_ref, kbuf, vbuf,
                   sem_k, sem_v):
    """Speculative-verify attention: K rows of ONE sequence at consecutive
    positions p0..p0+K-1.  All rows share the committed cache prefix
    [0, p0) (one (1, BT, D) slab DMA per block serves every row) and then
    attend the K in-VMEM current tokens CAUSALLY (row j sees rows <= j) —
    this is what lets one kernel invocation verify K drafted tokens with a
    single pass over the int8 weight stream.  scal_ref (3,): [p0, inv_lo,
    inv_hi] — the prompt-padding interval is common to the whole sequence.
    Returns the (K, D) context."""
    kk = q_in.shape[0]
    hd = d // heads
    hmask = hmask_ref[...]
    hmask_t = hmask_t_ref[...]
    q = q_in * (hd ** -0.5)       # (K, D) f32
    p0, lo, hi = scal_ref[0, 0], scal_ref[1, 0], scal_ref[2, 0]
    n_blocks = pl.cdiv(p0, bt)

    def dma_k(j, slot):
        return pltpu.make_async_copy(
            cache_ref.at[layer, 0, :, pl.ds(j * bt, bt), :],
            kbuf.at[slot], sem_k.at[slot])

    def dma_v(j, slot):
        return pltpu.make_async_copy(
            cache_ref.at[layer, 1, :, pl.ds(j * bt, bt), :],
            vbuf.at[slot], sem_v.at[slot])

    def head_sum(x):
        return jnp.dot(x, hmask, preferred_element_type=jnp.float32)

    def head_bcast(x):
        return jnp.dot(x, hmask_t, preferred_element_type=jnp.float32)

    def step(j, carry):
        m, l, acc = carry         # (K, H), (K, H), (K, D)
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_blocks)
        def _():
            nxt = jax.lax.rem(j + 1, 2)
            dma_k(j + 1, nxt).start()
            dma_v(j + 1, nxt).start()

        dma_k(j, slot).wait()
        t0 = j * bt
        k = kbuf[slot][0].astype(jnp.float32)         # (BT, D) shared slab
        scores = head_sum((q[:, None, :] * k[None]).reshape(kk * bt, d))
        scores = scores.reshape(kk, bt, heads)
        row = jax.lax.broadcasted_iota(jnp.int32, (kk, bt, heads), 1) + t0
        keep = (row < p0) & ((row < lo) | (row >= hi))
        scores = jnp.where(keep, scores, -jnp.inf)

        m_new = jnp.maximum(m, jnp.max(scores, axis=1))
        m_safe = jnp.where(m_new == -jnp.inf, 0.0, m_new)
        alpha = jnp.exp(m - m_safe)
        p = jnp.exp(scores - m_safe[:, None, :])
        l_new = l * alpha + jnp.sum(p, axis=1)

        dma_v(j, slot).wait()
        v = vbuf[slot][0].astype(jnp.float32)
        pb = head_bcast(p.reshape(kk * bt, heads)).reshape(kk, bt, d)
        pv = jnp.sum(pb * v, axis=1)
        acc_new = acc * head_bcast(alpha) + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((kk, heads), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((kk, heads), jnp.float32)
    a0 = jnp.zeros((kk, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, step, (m0, l0, a0))

    # causal tail over the K in-VMEM tokens: row j attends rows i <= j
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (kk, heads), 0)
    for i in range(kk):
        s_i = head_sum(q * k_cur[i:i + 1])            # (K, H)
        s_i = jnp.where(row_idx >= i, s_i, -jnp.inf)
        m_new = jnp.maximum(m, s_i)
        m_safe = jnp.where(m_new == -jnp.inf, 0.0, m_new)
        alpha = jnp.exp(m - m_safe)
        p_i = jnp.exp(s_i - m_safe)
        l = l * alpha + p_i
        acc = acc * head_bcast(alpha) + head_bcast(p_i) * v_cur[i:i + 1]
        m = m_new
    return acc / head_bcast(l)                        # (K, D)


def _kernel_batch(scal_ref, x_ref, w_ref, c_ref, *rest, heads, int4_groups,
                  int4_expand, int8_kv, has_src, tpg, block_t,
                  verify=False, readout=False, beam_k=0):
    """Batched variant of `_kernel_merged`: (B, D) activations, grid
    (L, 12/tpg).  Weight tiles stream exactly as in the batch-1 kernel (the
    DMA amortizes over the batch); the residual/ln/qkv/mlp scratch carries a
    B-row block; attention is `_attend_batch`.  scal_ref (3, B) packs
    [pos; invalid_lo; invalid_hi] per row (see `_attend_batch`)."""
    rest = list(rest)
    gs_ref = rest.pop(0) if int4_groups else None
    hmask_ref, hmask_t_ref, cache_ref = rest[:3]
    rest = rest[3:]
    kscale_ref = rest.pop(0) if int8_kv else None
    src_ref = rest.pop(0) if has_src else None
    ro_w_ref = rest.pop(0) if readout else None
    ro_c_ref = rest.pop(0) if readout else None
    lnf_ref = rest.pop(0) if readout else None
    y_ref, kv_ref = rest[0], rest[1]
    rest = rest[2:]
    logits_ref = rest.pop(0) if readout else None
    (x_s, ln_s, q_s, k_s, v_s, h_s, acc_s, kbuf, vbuf,
     sem_k, sem_v) = rest
    layer = pl.program_id(0)
    g = pl.program_id(1)
    n_layers = pl.num_programs(0) - (1 if readout else 0)
    d = x_ref.shape[1]

    def dot(src, t_global):
        j = t_global % tpg
        return _dot_one_tile(
            src, w_ref[0, j], c_ref[0, pl.ds(t_global, 1)],
            c_ref[0, pl.ds(t_global + 12, 1)],
            gs_ref[0, j] if int4_groups else None,
            int4_groups, int4_expand)

    def action(t):
        if t == 0:
            @pl.when(layer == 0)
            def _():
                x_s[...] = x_ref[...].astype(jnp.float32)
            ln_s[...] = _ln(x_s[...], c_ref[0, 24:25], c_ref[0, 25:26])
            pltpu.make_async_copy(
                cache_ref.at[layer, 0, :, pl.ds(0, block_t), :],
                kbuf.at[0], sem_k.at[0]).start()
            pltpu.make_async_copy(
                cache_ref.at[layer, 1, :, pl.ds(0, block_t), :],
                vbuf.at[0], sem_v.at[0]).start()
            q_s[...] = dot(ln_s[...], 0)
        elif t == 1:
            k = dot(ln_s[...], 1)
            k_s[...] = k
            kv_ref[0, 0] = k.astype(kv_ref.dtype)
        elif t == 2:
            v = dot(ln_s[...], 2)
            v_s[...] = v
            kv_ref[0, 1] = v.astype(kv_ref.dtype)
        elif t == 3:
            if verify:
                ctx = _attend_verify(layer, scal_ref, heads, d, block_t,
                                     q_s[...], k_s[...], v_s[...], hmask_ref,
                                     hmask_t_ref, cache_ref, kbuf, vbuf,
                                     sem_k, sem_v)
            else:
                ctx = _attend_batch(layer, scal_ref, heads, d, block_t,
                                    q_s[...], k_s[...], v_s[...], hmask_ref,
                                    hmask_t_ref, cache_ref, kscale_ref,
                                    src_ref, kbuf, vbuf, sem_k, sem_v,
                                    int8_kv, beam_k=beam_k)
            x_s[...] = x_s[...] + dot(ctx, 3)
            ln_s[...] = _ln(x_s[...], c_ref[0, 26:27], c_ref[0, 27:28])
        elif t in (4, 5, 6, 7):
            h_s[t - 4] = jax.nn.gelu(dot(ln_s[...], t), approximate=True)
        else:  # 8..11: down-projection partials over the h_s row tiles
            part = dot(h_s[t - 8], t)
            if t == 8:
                acc_s[...] = part
            else:
                acc_s[...] = acc_s[...] + part
            if t == 11:
                x_s[...] = x_s[...] + acc_s[...]

                @pl.when(layer == n_layers - 1)
                def _():
                    y_ref[...] = x_s[...]

    for grp in range(TILES_PER_LAYER // tpg):
        trunk_here = (g == grp) if not readout else ((g == grp)
                                                     & (layer < n_layers))

        @pl.when(trunk_here)
        def _(grp=grp):
            for j in range(tpg):
                action(grp * tpg + j)

    if readout:
        @pl.when(layer == n_layers)
        def _():
            @pl.when(g == 0)
            def _():
                ln_s[...] = _ln(x_s[...], lnf_ref[0:1], lnf_ref[1:2])
            src = ln_s[...].astype(jnp.bfloat16)       # (B, D)
            for j in range(tpg):
                yv = jnp.dot(src, ro_w_ref[0, j].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
                logits_ref[0, j] = (yv * ro_c_ref[0, j, 0:1]
                                    + ro_c_ref[0, j, 1:2])


@functools.partial(jax.jit,
                   static_argnames=("heads", "interpret", "int4_expand",
                                    "merge_stages", "beam_k"))
def fused_decode_step_batch(x: jnp.ndarray, pack: FusedDecodePack,
                            kv_cache: jnp.ndarray, bias: jnp.ndarray,
                            pos: jnp.ndarray, heads: int,
                            interpret: bool = False,
                            kv_scales: jnp.ndarray = None,
                            int4_expand: bool = False,
                            merge_stages: bool | int = False,
                            beam_src: jnp.ndarray = None,
                            readout_pack: ReadoutPack = None,
                            beam_k: int = 0):
    """Batched (2 <= B <= 8; up to 12 with a beam ancestor table) trunk
    megakernel step for batched serving.  x (B, D) token embeddings;
    kv_cache TIME-MAJOR
    (L, 2, B, Tmax, D); bias (B, Tmax) f32 additive mask (per-row prompt
    padding) — its masked set (entries < -1e29) MUST be one contiguous run
    per row (the `build_prompt` text-pad tail; asserted structurally by all
    callers), because the kernel receives it as per-row [lo, hi) interval
    scalars rather than a tensor (a lane-dim dynamic slice of a (B, Tmax)
    block needs 128-aligned offsets, which bt=64 at B >= 5 violates — the
    round-2 Mosaic compile failure); pos scalar (whole-batch decode: the
    engine buckets text lengths so rows share the position,
    `models/gpt/decode.py`) or (B,) per-row live prefix lengths (continuous
    batching: slots admitted at different times decode at their own
    positions; a pos of 0 marks an idle slot, which computes garbage but
    stays NaN-free and masked by the caller).

    Returns (hidden (B, D) f32 pre-ln_f, kv_new (L, 2, B, D)); write with
    `apply_kv_update_batch` (shared pos) / `apply_kv_update_rows` (per-row),
    or the `_q` variants for int8 KV (scales (L, B, Tmax, 2) from
    `quantize_kv_cache_batch`).

    Rationale (STATUS.md round-2 item): the batched XLA step reads the FULL
    padded KV cache every step (~1 GB at B=8/Tmax=512/bf16 — the dominant
    serving traffic) plus ~200 small kernels of launch overhead; this kernel
    reads only the live [0, pos) prefix and fuses the step like the batch-1
    megakernel, with the weight-tile DMA amortized across the batch.
    """
    l, _, b, t_max, d = kv_cache.shape
    int8_kv = kv_scales is not None
    has_src = beam_src is not None
    # request-batched beam (beam_k groups of K rows) runs up to 12 rows:
    # the forced bt=128 slabs stay ~8-16 MB under the 64 MiB VMEM budget
    b_cap = 12 if has_src else 8
    assert 1 <= b <= b_cap, (
        f"batched megakernel sized for B <= {b_cap} (VMEM slabs), got {b}")
    bt = batch_block_t(b)
    if has_src:
        # the ancestor table's lane-dim window reads need 128-aligned
        # offsets regardless of the slab-budget heuristic
        bt = max(bt, 128)
    assert t_max % bt == 0, "cache length must be a multiple of BLOCK_T"
    assert bias.shape == (b, t_max)
    assert not int8_kv or (kv_cache.dtype == jnp.int8
                           and kv_scales.shape == (l, b, t_max, 2))
    if has_src:
        assert beam_src.shape == (b, t_max)
        assert beam_k == 0 or b % beam_k == 0, (
            f"beam_k {beam_k} must divide the row count {b}")

    hmask = (jnp.arange(d)[:, None] // (d // heads)
             == jnp.arange(heads)[None, :]).astype(jnp.float32)

    int4 = isinstance(pack, FusedDecodePackInt4)
    # derive the group count from the pack itself (supports any width)
    int4_groups = pack.gscales.shape[2] if int4 else 0
    w_rows = d // 2 if int4 else d
    if int4_expand not in (False, True, "i8sh"):
        raise ValueError(f"int4_expand must be False, True, or 'i8sh', "
                         f"got {int4_expand!r}")
    tpg = (3 if merge_stages is True else int(merge_stages)) or 1
    if tpg not in (1, 3, 6):
        raise ValueError(
            f"merge_stages must be one of 0/False, 3, or 6, got "
            f"{merge_stages!r}")
    ro = readout_pack is not None
    gg = TILES_PER_LAYER // tpg
    if ro:
        def w_idx(i, t, s):
            return (jnp.minimum(i, l - 1),
                    jnp.where(i >= l, gg - 1, t), 0, 0)

        def c_idx(i, t, s):
            return (jnp.minimum(i, l - 1), 0, 0)

        def c_idx4(i, t, s):
            return (jnp.minimum(i, l - 1), 0, 0, 0)
    else:
        def w_idx(i, t, s):
            return (i, t, 0, 0)

        def c_idx(i, t, s):
            return (i, 0, 0)

        def c_idx4(i, t, s):
            return (i, 0, 0, 0)
    in_specs = [
        pl.BlockSpec((b, d), lambda i, t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tpg, w_rows, d), w_idx,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 28, d), c_idx,
                     memory_space=pltpu.VMEM),
    ]
    if int4:
        in_specs.append(
            pl.BlockSpec((1, tpg, int4_groups, d), w_idx,
                         memory_space=pltpu.VMEM))
    in_specs += [
        pl.BlockSpec((d, heads), lambda i, t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, d), lambda i, t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),            # kv cache (HBM)
    ]
    if int8_kv:
        in_specs.append(
            pl.BlockSpec((1, b, t_max, 2), c_idx4,
                         memory_space=pltpu.VMEM))    # per-layer kv scales
    if has_src:
        in_specs.append(
            pl.BlockSpec((b, t_max), lambda i, t, s: (0, 0),
                         memory_space=pltpu.VMEM))    # beam ancestor table
    extra_args = []
    if ro:
        assert readout_pack.w.shape[0] == RO_TILES
        vt = readout_pack.w.shape[2]
        in_specs += [
            pl.BlockSpec((1, tpg, d, vt),
                         lambda i, t, s: (jnp.where(i >= l, t, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpg, 2, vt),
                         lambda i, t, s: (jnp.where(i >= l, t, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d), lambda i, t, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        extra_args = [readout_pack.w.reshape(gg, tpg, d, vt),
                      readout_pack.consts.reshape(gg, tpg, 2, vt),
                      readout_pack.lnf]
    out_specs = [
        pl.BlockSpec((b, d), lambda i, t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, b, d), c_idx4,
                     memory_space=pltpu.VMEM),        # per-layer new k/v
    ]
    if ro:
        out_specs.append(
            pl.BlockSpec((1, tpg, b, vt),
                         lambda i, t, s: (jnp.where(i >= l, t, 0), 0, 0, 0),
                         memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(l + (1 if ro else 0), gg),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),          # x_s residual
            pltpu.VMEM((b, d), jnp.float32),          # ln_s
            pltpu.VMEM((b, d), jnp.float32),          # q_s
            pltpu.VMEM((b, d), jnp.float32),          # k_s
            pltpu.VMEM((b, d), jnp.float32),          # v_s
            pltpu.VMEM((4, b, d), jnp.float32),       # h_s mlp activations
            pltpu.VMEM((b, d), jnp.float32),          # acc_s
            pltpu.VMEM((2, b, bt, d), kv_cache.dtype),  # kbuf
            pltpu.VMEM((2, b, bt, d), kv_cache.dtype),  # vbuf
            pltpu.SemaphoreType.DMA((2,)),            # sem_k
            pltpu.SemaphoreType.DMA((2,)),            # sem_v
        ],
    )
    kernel = functools.partial(
        _kernel_batch, heads=heads, int4_groups=int4_groups,
        int4_expand=int4_expand, int8_kv=int8_kv, has_src=has_src,
        tpg=tpg, block_t=bt, readout=ro, beam_k=beam_k)
    pos_vec = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))
    # bias -> per-row contiguous invalid interval [lo, hi) (see docstring)
    invalid = bias < -1e29
    inv_lo = jnp.argmax(invalid, axis=1).astype(jnp.int32)  # 0 if none
    inv_hi = inv_lo + jnp.sum(invalid, axis=1).astype(jnp.int32)
    scal = jnp.stack([pos_vec, inv_lo, inv_hi])           # (3, B) SMEM
    args = [scal, x.astype(jnp.float32),
            pack.w, pack.consts]
    if int4:
        args.append(pack.gscales)
    args += [hmask, jnp.transpose(hmask), kv_cache]
    if int8_kv:
        args.append(kv_scales)
    if has_src:
        args.append(beam_src.astype(jnp.int32))
    args += extra_args
    kv_new_dtype = jnp.float32 if int8_kv else kv_cache.dtype
    out_shapes = [
        jax.ShapeDtypeStruct((b, d), jnp.float32),
        jax.ShapeDtypeStruct((l, 2, b, d), kv_new_dtype),
    ]
    if ro:
        out_shapes.append(
            jax.ShapeDtypeStruct((gg, tpg, b, vt), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        # the double-buffered weight block (tpg int8 tiles, ~9.8 MB at
        # merge=3/D=1280) + the (2, B, BT, D) k/v slabs (~5.2 MB bf16)
        # overflow the 16 MiB default scoped budget by ~0.5 MB at B in
        # {2, 4, 8} (COMPILE_GATE round-3: "scoped allocation 16.5M");
        # v5e VMEM (128 MiB) has ample headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if ro:
        y, kv_new, logits = outs
        # (gg, tpg, b, vt) tile-major -> (b, 12*vt); caller slices vocab
        logits = jnp.transpose(logits, (2, 0, 1, 3)).reshape(b,
                                                             RO_TILES * vt)
        return y, kv_new, logits
    y, kv_new = outs
    return y, kv_new


@functools.partial(jax.jit,
                   static_argnames=("heads", "interpret", "int4_expand",
                                    "merge_stages"))
def fused_decode_verify(x: jnp.ndarray, pack: FusedDecodePack,
                        kv_cache: jnp.ndarray, bias: jnp.ndarray,
                        pos: jnp.ndarray, heads: int,
                        interpret: bool = False,
                        int4_expand: bool = False,
                        merge_stages: bool | int = False):
    """Speculative-verify trunk step: K tokens of ONE sequence in a single
    megakernel pass.  x (K, D) embeddings of tokens at positions
    pos..pos+K-1; kv_cache TIME-MAJOR (L, 2, 1, Tmax, D) (the batch-1
    cache); bias (Tmax, 1) as in `fused_decode_step`; pos scalar = the
    first row's position (cache positions [0, pos) are committed history).

    The weight stream is read ONCE for all K tokens — the whole point of
    speculative decoding on a weight-DMA-bound decode: K drafted tokens
    verify at ~1 token's weight traffic.  Attention: shared prefix +
    in-VMEM causal tail over the K rows (`_attend_verify`).

    Returns (hidden (K, D) f32, kv_new (L, 2, K, D)); commit with
    `apply_kv_update_span` (write all K rows — rows past the accepted count
    are garbage beyond the live prefix and masked by `pos` bookkeeping).
    """
    l, _, b, t_max, d = kv_cache.shape
    kk = x.shape[0]
    assert b == 1 and d % heads == 0 and x.shape == (kk, d)
    assert 2 <= kk <= 8, "verify sized for 2..8 draft tokens"
    assert t_max % BLOCK_T == 0
    assert bias.shape == (t_max, 1)

    hmask = (jnp.arange(d)[:, None] // (d // heads)
             == jnp.arange(heads)[None, :]).astype(jnp.float32)
    int4 = isinstance(pack, FusedDecodePackInt4)
    int4_groups = pack.gscales.shape[2] if int4 else 0
    w_rows = d // 2 if int4 else d
    if int4_expand not in (False, True, "i8sh"):
        raise ValueError(f"int4_expand must be False, True, or 'i8sh', "
                         f"got {int4_expand!r}")
    tpg = (3 if merge_stages is True else int(merge_stages)) or 1
    if tpg not in (1, 3, 6):
        raise ValueError(f"merge_stages must be 0/False, 3 or 6, got "
                         f"{merge_stages!r}")
    in_specs = [
        pl.BlockSpec((kk, d), lambda i, t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tpg, w_rows, d), lambda i, t, s: (i, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 28, d), lambda i, t, s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if int4:
        in_specs.append(
            pl.BlockSpec((1, tpg, int4_groups, d),
                         lambda i, t, s: (i, t, 0, 0),
                         memory_space=pltpu.VMEM))
    in_specs += [
        pl.BlockSpec((d, heads), lambda i, t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, d), lambda i, t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),            # kv cache (HBM)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(l, TILES_PER_LAYER // tpg),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((kk, d), lambda i, t, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, kk, d), lambda i, t, s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((kk, d), jnp.float32),         # x_s
            pltpu.VMEM((kk, d), jnp.float32),         # ln_s
            pltpu.VMEM((kk, d), jnp.float32),         # q_s
            pltpu.VMEM((kk, d), jnp.float32),         # k_s
            pltpu.VMEM((kk, d), jnp.float32),         # v_s
            pltpu.VMEM((4, kk, d), jnp.float32),      # h_s
            pltpu.VMEM((kk, d), jnp.float32),         # acc_s
            pltpu.VMEM((2, 1, BLOCK_T, d), kv_cache.dtype),  # kbuf
            pltpu.VMEM((2, 1, BLOCK_T, d), kv_cache.dtype),  # vbuf
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel_batch, heads=heads, int4_groups=int4_groups,
        int4_expand=int4_expand, int8_kv=False, has_src=False, tpg=tpg,
        block_t=BLOCK_T, verify=True)
    invalid = bias[:, 0] < -1e29
    inv_lo = jnp.argmax(invalid).astype(jnp.int32)
    inv_hi = inv_lo + jnp.sum(invalid).astype(jnp.int32)
    scal = jnp.stack([jnp.asarray(pos, jnp.int32).reshape(()),
                      inv_lo, inv_hi]).reshape(3, 1)
    args = [scal, x.astype(jnp.float32), pack.w, pack.consts]
    if int4:
        args.append(pack.gscales)
    args += [hmask, jnp.transpose(hmask), kv_cache]
    y, kv_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((kk, d), jnp.float32),
            jax.ShapeDtypeStruct((l, 2, kk, d), kv_cache.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return y, kv_new


def apply_kv_update_span(kv_cache: jnp.ndarray, kv_new: jnp.ndarray,
                         pos: jnp.ndarray) -> jnp.ndarray:
    """Write kv_new (L, 2, K, D) at the contiguous span [pos, pos+K) of the
    batch-1 time-major cache (speculative verify commit)."""
    return jax.lax.dynamic_update_slice(
        kv_cache, kv_new[:, :, None].astype(kv_cache.dtype),
        (0, 0, 0, pos, 0))


def quantize_kv_cache_batch(tm_cache: jnp.ndarray):
    """Per-(row, position) int8 quantization of a batched time-major cache:
    (L, 2, B, T, D) float -> (int8 cache, scales (L, B, T, 2) f32)."""
    s = jnp.max(jnp.abs(tm_cache.astype(jnp.float32)), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-12)                     # (L, 2, B, T)
    q = jnp.round(tm_cache.astype(jnp.float32) / s[..., None])
    q = jnp.clip(q, -127, 127).astype(jnp.int8)
    return q, jnp.transpose(s, (0, 2, 3, 1))


def apply_kv_update_batch(kv_cache: jnp.ndarray, kv_new: jnp.ndarray,
                          pos: jnp.ndarray) -> jnp.ndarray:
    """Write kv_new (L, 2, B, D) into the batched time-major cache at the
    shared position pos."""
    return jax.lax.dynamic_update_slice(
        kv_cache, kv_new[:, :, :, None, :].astype(kv_cache.dtype),
        (0, 0, 0, pos, 0))


def apply_kv_update_q_batch(kv_cache: jnp.ndarray, kv_scales: jnp.ndarray,
                            kv_new: jnp.ndarray, pos: jnp.ndarray):
    """Quantize kv_new (L, 2, B, D) f32 and write rows + scales at the shared
    position into the int8 cache / (L, B, Tmax, 2) scale table."""
    s = jnp.maximum(jnp.max(jnp.abs(kv_new), axis=-1) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(kv_new / s[..., None]), -127, 127).astype(jnp.int8)
    cache = jax.lax.dynamic_update_slice(
        kv_cache, q[:, :, :, None, :], (0, 0, 0, pos, 0))
    scales = jax.lax.dynamic_update_slice(
        kv_scales, jnp.transpose(s, (0, 2, 1))[:, :, None, :], (0, 0, pos, 0))
    return cache, scales


def apply_kv_update_rows(kv_cache: jnp.ndarray, kv_new: jnp.ndarray,
                         pos: jnp.ndarray) -> jnp.ndarray:
    """Per-row write: kv_new (L, 2, B, D) lands at each row's own position
    pos (B,) in the batched time-major cache (continuous batching)."""
    def one(cache_b, new_b, p):  # (L, 2, T, D), (L, 2, D), scalar
        return jax.lax.dynamic_update_slice(
            cache_b, new_b[:, :, None, :].astype(cache_b.dtype), (0, 0, p, 0))
    return jax.vmap(one, in_axes=(2, 2, 0), out_axes=2)(kv_cache, kv_new, pos)


def apply_kv_update_q_rows(kv_cache: jnp.ndarray, kv_scales: jnp.ndarray,
                           kv_new: jnp.ndarray, pos: jnp.ndarray):
    """Per-row int8 write: quantize kv_new (L, 2, B, D) f32 and place each
    row + scale at its own position pos (B,) (cache int8 (L, 2, B, T, D),
    scales (L, B, T, 2))."""
    s = jnp.maximum(jnp.max(jnp.abs(kv_new), axis=-1) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(kv_new / s[..., None]), -127, 127).astype(jnp.int8)

    def one(cache_b, scale_b, q_b, s_b, p):
        # (L, 2, T, D), (L, T, 2), (L, 2, D), (L, 2), scalar
        cache_b = jax.lax.dynamic_update_slice(
            cache_b, q_b[:, :, None, :], (0, 0, p, 0))
        scale_b = jax.lax.dynamic_update_slice(
            scale_b, s_b[:, None, :], (0, p, 0))
        return cache_b, scale_b
    return jax.vmap(one, in_axes=(2, 1, 2, 2, 0), out_axes=(2, 1))(
        kv_cache, kv_scales, q, s, pos)


def apply_kv_update(kv_cache: jnp.ndarray, kv_new: jnp.ndarray,
                    pos: jnp.ndarray) -> jnp.ndarray:
    """Write kv_new (L, 2, D) into the time-major cache at position pos."""
    return jax.lax.dynamic_update_slice(
        kv_cache, kv_new[:, :, None, None, :].astype(kv_cache.dtype),
        (0, 0, 0, pos, 0))


def apply_kv_update_q(kv_cache: jnp.ndarray, kv_scales: jnp.ndarray,
                      kv_new: jnp.ndarray, pos: jnp.ndarray):
    """Quantize kv_new (L, 2, D) f32 and write row + scale at position pos
    into the int8 cache / (L, Tmax, 2) scale table."""
    q, s = quantize_kv_rows(kv_new)
    cache = jax.lax.dynamic_update_slice(
        kv_cache, q[:, :, None, None, :], (0, 0, 0, pos, 0))
    scales = jax.lax.dynamic_update_slice(
        kv_scales, s[:, None, :], (0, pos, 0))
    return cache, scales
