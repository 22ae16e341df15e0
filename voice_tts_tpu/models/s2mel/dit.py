"""Flow-matching DiT estimator (semantic condition + noise -> mel velocity).

Parity with reference `s2mel/modules/diffusion_transformer.py` +
`s2mel/modules/gpt_fast/model.py` as configured by IndexTTS2: llama-style
transformer with AdaLN(RMSNorm) conditioned on the timestep embedding,
interleaved-pair RoPE, SwiGLU FF, full (non-causal) attention with key
masking, long skip connection, WaveNet final head.

Dead-at-inference reference pieces (x_embedder, cond_embedder for discrete
content, content_mask_embedder, class dropout) are omitted.

The CFM Euler solve re-evaluates this estimator 25x with only (x, t)
changing.  All timestep-dependent projections (both timestep-embedder MLPs,
every block's two AdaLN projections, the transformer-norm and final-layer
modulations) are therefore exposed via `step_tables(t_span)`: one batched
evaluation over the whole step schedule, whose per-step slices `__call__`
accepts via `tables=` to skip those projections inside the scan body
(`models/s2mel/cfm.py`).  Numerics are identical — the same params applied
to the same t values, just batched over steps.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from voice_tts_tpu.config import DiTConfig, WaveNetConfig
from voice_tts_tpu.models.layers import Conv1d, Linear, RMSNorm
from voice_tts_tpu.models.s2mel.wavenet import WN


def find_multiple(n: int, k: int) -> int:
    return n if n % k == 0 else n + k - (n % k)


def rope_cache(seq_len: int, head_dim: int, base: float) -> np.ndarray:
    """(seq_len, head_dim//2, 2) cos/sin cache (reference
    `gpt_fast/model.py:336-346`)."""
    freqs = 1.0 / (base ** (np.arange(0, head_dim, 2)[: head_dim // 2] / head_dim))
    t = np.arange(seq_len)
    angles = np.outer(t, freqs)
    return np.stack([np.cos(angles), np.sin(angles)], axis=-1).astype(np.float32)


def apply_rope(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """x (B, T, H, D); freqs (T, D//2, 2); interleaved-pair rotation."""
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    cos = freqs[None, :, None, :, 0]
    sin = freqs[None, :, None, :, 1]
    out = jnp.stack([
        xf[..., 0] * cos - xf[..., 1] * sin,
        xf[..., 1] * cos + xf[..., 0] * sin,
    ], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


class AdaptiveRMSNorm(nn.Module):
    """weight * RMSNorm(x) + bias, (weight, bias) from the time embedding
    (reference `gpt_fast/model.py:20-38`).  `project` is exposed separately
    so the CFM loop can batch it over all timesteps (`DiT.step_tables`)."""

    dim: int

    def setup(self):
        self.project_layer = Linear(2 * self.dim)
        self.norm = RMSNorm()

    def project(self, c: jnp.ndarray) -> jnp.ndarray:
        return self.project_layer(c)

    def __call__(self, x: jnp.ndarray, c: Optional[jnp.ndarray] = None,
                 wb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if wb is None:
            wb = self.project(c)
        weight, bias = jnp.split(wb.astype(x.dtype), 2, axis=-1)
        return weight * self.norm(x) + bias


class DiTBlock(nn.Module):
    cfg: DiTConfig

    def setup(self):
        d = self.cfg.hidden_dim
        self.attention_norm = AdaptiveRMSNorm(d)
        self.wqkv = Linear(3 * d, use_bias=False)
        self.wo = Linear(d, use_bias=False)
        self.ffn_norm = AdaptiveRMSNorm(d)
        inner = find_multiple(int(2 * 4 * d / 3), 256)
        self.w1 = Linear(inner, use_bias=False)
        self.w3 = Linear(inner, use_bias=False)
        self.w2 = Linear(d, use_bias=False)

    def __call__(self, x, c, freqs, mask, x_lens=None, tables=None):
        d = self.cfg.hidden_dim
        h = self.cfg.num_heads
        hd = d // h
        b, t, _ = x.shape
        wb_attn, wb_ffn = tables if tables is not None else (None, None)

        y = self.attention_norm(x, c, wb=wb_attn)
        qkv = self.wqkv(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = apply_rope(q.reshape(b, t, h, hd), freqs)
        k = apply_rope(k.reshape(b, t, h, hd), freqs)
        v = v.reshape(b, t, h, hd)
        if (self.cfg.fused_attention and x_lens is not None
                and jax.default_backend() == "tpu"):
            # whole-sequence VMEM attention: zero HBM score traffic (the
            # einsum path's f32 score tensor is the dominant CFM-step cost)
            from voice_tts_tpu.ops.attic.cfm_attention import cfm_attention

            out = cfm_attention(jnp.transpose(q, (0, 2, 1, 3)),
                                jnp.transpose(k, (0, 2, 1, 3)),
                                jnp.transpose(v, (0, 2, 1, 3)),
                                x_lens, 1.0 / math.sqrt(hd))
            attn = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, d)
        elif self.cfg.flash_attention and jax.default_backend() == "tpu":
            # Pallas flash attention: never materializes the (B,H,T,T)
            # score tensor (the einsum path writes+reads it twice per block
            # — the dominant HBM traffic of a CFM step).  Padded key
            # positions are fenced via segment ids; padded-query outputs are
            # garbage either way and the WN head re-masks per layer.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, SegmentIds, flash_attention)

            pad = (-t) % 128
            qf = jnp.transpose(q, (0, 2, 1, 3))          # (B, H, T, hd)
            kf = jnp.transpose(k, (0, 2, 1, 3))
            vf = jnp.transpose(v, (0, 2, 1, 3))
            if pad:
                qf = jnp.pad(qf, ((0, 0), (0, 0), (0, pad), (0, 0)))
                kf = jnp.pad(kf, ((0, 0), (0, 0), (0, pad), (0, 0)))
                vf = jnp.pad(vf, ((0, 0), (0, 0), (0, pad), (0, 0)))
            valid = mask[:, 0, :]                        # (B, T) key validity
            seg = jnp.pad(valid.astype(jnp.int32), ((0, 0), (0, pad)))
            tp = t + pad
            blk = next(bs for bs in (512, 256, 128) if tp % bs == 0)
            sizes = BlockSizes(block_q=blk, block_k_major=blk, block_k=blk,
                               block_b=1)
            out = flash_attention(
                qf, kf, vf, segment_ids=SegmentIds(seg, seg),
                sm_scale=1.0 / math.sqrt(hd), block_sizes=sizes)
            attn = jnp.transpose(out[:, :, :t], (0, 2, 1, 3)).reshape(b, t, d)
        else:
            scores = jnp.einsum("bihd,bjhd->bhij", q, k) / math.sqrt(hd)
            # softmax stats in f32 regardless of compute dtype (bf16 path)
            scores = scores.astype(jnp.float32)
            scores = jnp.where(mask[:, None, :, :], scores,
                               jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            attn = jnp.einsum("bhij,bjhd->bihd", probs, v).reshape(b, t, d)
        x = x + self.wo(attn)

        y = self.ffn_norm(x, c, wb=wb_ffn)
        x = x + self.w2(nn.silu(self.w1(y)) * self.w3(y))
        return x


class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep embedding + MLP (reference
    `diffusion_transformer.py:19-60`; scale=1000, max_period=10000)."""

    hidden: int
    freq_dim: int = 256

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.freq_dim // 2
        freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
        args = 1000.0 * t[:, None].astype(jnp.float32) * freqs[None]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        emb = Linear(self.hidden, name="mlp_0")(emb)
        emb = nn.silu(emb)
        return Linear(self.hidden, name="mlp_2")(emb)


class FinalLayer(nn.Module):
    """adaLN-modulated LayerNorm + linear (reference
    `diffusion_transformer.py:87-101`).  `modulation` exposed separately
    for `DiT.step_tables`."""

    hidden: int

    def setup(self):
        self.adaLN_1 = Linear(2 * self.hidden)
        self.linear = Linear(self.hidden)

    def modulation(self, c: jnp.ndarray) -> jnp.ndarray:
        return self.adaLN_1(nn.silu(c))

    def __call__(self, x: jnp.ndarray, c: Optional[jnp.ndarray] = None,
                 mod: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if mod is None:
            mod = self.modulation(c)
        shift, scale = jnp.split(mod.astype(x.dtype), 2, axis=-1)
        xf = x.astype(jnp.float32)  # LN stats in f32 (bf16 path)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)
        y = y * (1 + scale[:, None, :]) + shift[:, None, :]
        return self.linear(y)


class DiT(nn.Module):
    """Velocity estimator.

    Inputs mirror the reference estimator call
    (`flow_matching.py:96-101`): x (B, 80, T) noisy mel, prompt_x (B, 80, T)
    pinned prompt mel, x_lens (B,), t (B,), style (B, 192), cond (B, T, 512).
    """

    cfg: DiTConfig
    wavenet_cfg: WaveNetConfig

    def setup(self):
        c = self.cfg
        w = self.wavenet_cfg
        self.t_embedder = TimestepEmbedder(c.hidden_dim)
        self.cond_projection = Linear(c.hidden_dim)
        self.cond_x_merge_linear = Linear(c.hidden_dim)
        for i in range(c.depth):
            setattr(self, f"block_{i}", DiTBlock(c))
        self.transformer_norm = AdaptiveRMSNorm(c.hidden_dim)
        if c.long_skip_connection:
            self.skip_linear = Linear(c.hidden_dim)
        self.t_embedder2 = TimestepEmbedder(w.hidden_dim)
        self.conv1 = Linear(w.hidden_dim)
        self.wavenet = WN(w)
        self.res_projection = Linear(w.hidden_dim)
        self.final_layer = FinalLayer(w.hidden_dim)
        self.conv2 = Conv1d(c.in_channels, 1)

    def step_tables(self, t_span: jnp.ndarray):
        """Batch every timestep-dependent projection over a step schedule.

        t_span (S,) -> pytree whose leaves have leading axis S; a
        `lax.scan` over it feeds `__call__(tables=...)` per-step slices.
        Shapes carry a broadcast batch dim of 1 (all batch rows share t)."""
        c = self.cfg
        t1 = self.t_embedder(t_span)                      # (S, D)
        t2 = self.t_embedder2(t_span)                     # (S, wD)
        ce = t1[:, None, :]                               # (S, 1, D)
        blocks = tuple(
            (getattr(self, f"block_{i}").attention_norm.project(ce),
             getattr(self, f"block_{i}").ffn_norm.project(ce))
            for i in range(c.depth))
        return {
            "t1": t1[:, None, :],                         # -> (1, D)
            "t2": t2[:, None, :],                         # -> (1, wD)
            "blocks": blocks,                             # -> (1, 1, 2D)
            "norm": self.transformer_norm.project(ce),    # -> (1, 1, 2D)
            "final": self.final_layer.modulation(t1)[:, None, :],
        }

    def __call__(self, x, prompt_x, x_lens, t, style, cond, tables=None,
                 fused_w=None):
        """`fused_w` (depth, 5, 3, D, D) bf16 (`ops.dit_blocks.pack_dit_blocks`)
        runs the whole block trunk as ONE Pallas megakernel; requires
        `tables` carrying a `fused_wb` entry (`pack_dit_tables`).  The
        einsum block loop is the default (and exact-parity) path."""
        c = self.cfg
        b, _, tlen = x.shape

        # compute dtype follows the (possibly bf16) inputs; the timestep
        # embedding must come back down to it or every adaLN projection —
        # and through them every matmul — silently promotes to f32
        if tables is None:
            t1 = self.t_embedder(t).astype(x.dtype)
        else:
            t1 = tables["t1"].astype(x.dtype)
        cond = self.cond_projection(cond)

        xt = jnp.transpose(x, (0, 2, 1))
        pt = jnp.transpose(prompt_x, (0, 2, 1))
        x_in = jnp.concatenate(
            [xt, pt, cond, jnp.broadcast_to(style[:, None, :],
                                            (b, tlen, style.shape[-1]))], axis=-1)
        h = self.cond_x_merge_linear(x_in)

        mask = (jnp.arange(tlen)[None, :] < x_lens[:, None])  # (B, T)
        attn_mask = jnp.broadcast_to(mask[:, None, :], (b, tlen, tlen))

        freqs = jnp.asarray(rope_cache(tlen, c.hidden_dim // c.num_heads,
                                       c.rope_base))
        c_emb = t1[:, None, :]
        if fused_w is not None and tables is not None and "fused_wb" in tables:
            from voice_tts_tpu.ops.attic.dit_blocks import (dit_block_chain,
                                                      rope_tables)

            cos, sin, perm = rope_tables(tlen, c.hidden_dim // c.num_heads,
                                         c.rope_base)
            h = dit_block_chain(
                h.astype(jnp.float32), fused_w, tables["fused_wb"],
                cos, sin, perm, x_lens, c.num_heads,
                interpret=jax.default_backend() != "tpu").astype(h.dtype)
        else:
            for i in range(c.depth):
                h = getattr(self, f"block_{i}")(
                    h, c_emb, freqs, attn_mask, x_lens,
                    tables["blocks"][i] if tables is not None else None)
        h = self.transformer_norm(
            h, c_emb, wb=tables["norm"] if tables is not None else None)

        if c.long_skip_connection:
            h = self.skip_linear(jnp.concatenate([h, xt], axis=-1))

        # wavenet final head
        if tables is None:
            t2 = self.t_embedder2(t).astype(x.dtype)
        else:
            t2 = tables["t2"].astype(x.dtype)
        y = self.conv1(h)
        y = jnp.transpose(y, (0, 2, 1))
        x_mask = mask[:, None, :].astype(y.dtype)
        g = jnp.broadcast_to(t2[:, :, None], (b, t2.shape[-1], 1))
        # x_lens gives the WN convs exact-length reflect-boundary semantics
        # at the dynamic valid boundary (padded-bucket parity; the entry `y`
        # also carries garbage at padded positions from the padded-query
        # attention rows, which reflect_fill overwrites with valid frames)
        y = self.wavenet(y, x_mask, g=g, x_lens=x_lens)
        y = jnp.transpose(y, (0, 2, 1)) + self.res_projection(h)
        y = self.final_layer(
            y, t1, mod=tables["final"] if tables is not None else None)
        y = jnp.transpose(y, (0, 2, 1))
        return self.conv2(y)
