"""DiT trunk megakernel vs the einsum block loop (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voice_tts_tpu.config import DiTConfig, WaveNetConfig
from voice_tts_tpu.models.s2mel.dit import DiT, rope_cache
from voice_tts_tpu.ops.attic.dit_blocks import (dit_block_chain, pack_dit_blocks,
                                          pack_dit_tables, rope_tables)

# hidden_dim must satisfy find_multiple(8D/3, 256) == 3D (the kernel's
# 3-column-tile FFN layout): true for the flagship 512 and for 256 here
CFG = DiTConfig(hidden_dim=256, depth=2, num_heads=4, in_channels=8,
                style_dim=12, content_dim=16)
WCFG = WaveNetConfig(hidden_dim=32, num_layers=2, kernel_size=3)


@pytest.fixture(scope="module")
def setup():
    model = DiT(CFG, WCFG)
    b, t = 2, 128
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, CFG.in_channels, t))
    prompt = jax.random.normal(jax.random.PRNGKey(1), (b, CFG.in_channels, t))
    style = jax.random.normal(jax.random.PRNGKey(2), (b, CFG.style_dim))
    cond = jax.random.normal(jax.random.PRNGKey(3), (b, t, CFG.content_dim))
    lens = jnp.asarray([t, 96], jnp.int32)
    tt = jnp.full((b,), 0.3)
    params = model.init(jax.random.PRNGKey(4), x, prompt, lens, tt, style,
                        cond)
    return model, params, b, t, lens


def _trunk(self, h, freqs, mask, x_lens, block_tables):
    for i in range(self.cfg.depth):
        h = getattr(self, f"block_{i}")(h, None, freqs, mask, x_lens,
                                        block_tables[i])
    return h


def test_block_chain_matches_einsum(setup):
    model, params, b, t, lens = setup
    d, hd = CFG.hidden_dim, CFG.hidden_dim // CFG.num_heads

    t_span = jnp.asarray([0.12, 0.77])
    tables = model.apply(params, t_span, method=DiT.step_tables)
    w_tiles = pack_dit_blocks(params, CFG.depth)
    assert w_tiles.shape == (CFG.depth, 5, 3, d, d)
    wb_all = pack_dit_tables(params, tables, CFG.depth)
    assert wb_all.shape == (len(t_span), CFG.depth, 2, 2 * d)

    cos, sin, perm = rope_tables(t, hd, CFG.rope_base)
    freqs = jnp.asarray(rope_cache(t, hd, CFG.rope_base))
    mask = jnp.broadcast_to(
        (jnp.arange(t)[None, :] < lens[:, None])[:, None, :], (b, t, t))

    h0 = jax.random.normal(jax.random.PRNGKey(7), (b, t, d)) * 0.7

    for s in range(len(t_span)):
        block_tables = tuple(
            (tables["blocks"][i][0][s:s + 1], tables["blocks"][i][1][s:s + 1])
            for i in range(CFG.depth))
        ref = model.apply(params, h0, freqs, mask, lens, block_tables,
                          method=_trunk)
        out = dit_block_chain(h0, w_tiles, wb_all[s], cos, sin, perm, lens,
                              CFG.num_heads, interpret=True)
        r = np.asarray(ref, np.float32)
        o = np.asarray(out, np.float32)
        # bf16 storage between stages: ~1e-2-relative path (see module doc);
        # compare only rows the caller consumes (query pos < lens)
        for bi in range(b):
            n = int(lens[bi])
            scale = np.abs(r[bi, :n]).max()
            np.testing.assert_allclose(o[bi, :n], r[bi, :n],
                                       atol=0.02 * scale, rtol=0.05)


def test_dit_call_fused_matches_einsum(setup):
    """Full DiT.__call__ with fused_w == the einsum path (bf16 tolerance),
    exercising the engine's integration route (tables + fused_wb)."""
    model, params, b, t, lens = setup
    x = jax.random.normal(jax.random.PRNGKey(10), (b, CFG.in_channels, t))
    prompt = jax.random.normal(jax.random.PRNGKey(11),
                               (b, CFG.in_channels, t)) * 0.2
    style = jax.random.normal(jax.random.PRNGKey(12), (b, CFG.style_dim))
    cond = jax.random.normal(jax.random.PRNGKey(13), (b, t, CFG.content_dim))
    tt = jnp.full((b,), 0.4)

    t_span = jnp.asarray([0.4])
    tables = model.apply(params, t_span, method=DiT.step_tables)
    w_tiles = pack_dit_blocks(params, CFG.depth)
    tables["fused_wb"] = pack_dit_tables(params, tables, CFG.depth)
    tab0 = jax.tree.map(lambda a: a[0], tables)

    ref = model.apply(params, x, prompt, lens, tt, style, cond,
                      tables=jax.tree.map(
                          lambda a: a[0],
                          {k: v for k, v in tables.items() if k != "fused_wb"}))
    out = model.apply(params, x, prompt, lens, tt, style, cond,
                      tables=tab0, fused_w=w_tiles)
    r = np.asarray(ref, np.float32)
    o = np.asarray(out, np.float32)
    for bi in range(b):
        n = int(lens[bi])
        scale = np.abs(r[bi, :, :n]).max()
        np.testing.assert_allclose(o[bi, :, :n], r[bi, :, :n],
                                   atol=0.03 * scale, rtol=0.05)


def test_rope_tables_match_apply_rope(setup):
    """cos/sin/perm tables reproduce apply_rope exactly (f32)."""
    from voice_tts_tpu.models.s2mel.dit import apply_rope

    t, hd, heads = 64, 64, 4
    cos, sin, perm = rope_tables(t, hd, 10000.0)
    freqs = jnp.asarray(rope_cache(t, hd, 10000.0))
    q = jax.random.normal(jax.random.PRNGKey(0), (1, t, heads, hd))
    ref = apply_rope(q, freqs)                      # (1, T, H, hd)
    for hh in range(heads):
        qh = q[0, :, hh]                            # (T, hd)
        ours = qh * cos + (qh @ perm) * sin
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref[0, :, hh]),
                                   atol=2e-6, rtol=1e-5)
