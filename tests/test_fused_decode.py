"""Fused decode-step megakernel: packing + parity vs the XLA decode path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voice_tts_tpu.config import ConformerConfig, GPTConfig, GenerationConfig
from voice_tts_tpu.models.gpt import UnifiedVoice
from voice_tts_tpu.models.gpt.decode import decode
from voice_tts_tpu.ops.fused_decode import (BLOCK_T, apply_kv_update,
                                            cache_to_time_major,
                                            fused_decode_step, pack_gpt)
from voice_tts_tpu.utils.quantize import quantize_gpt_params

CFG = GPTConfig(
    layers=2, model_dim=256, heads=4, max_text_tokens=32, max_mel_tokens=48,
    number_text_tokens=40, number_mel_codes=68, start_mel_token=66,
    stop_mel_token=67, condition_num_latent=4, emo_dim=1024,
    condition_module=ConformerConfig(
        input_size=24, output_size=32, attention_heads=2, linear_units=48,
        num_blocks=1, input_layer="conv2d2", perceiver_mult=2),
    emo_condition_module=ConformerConfig(
        input_size=24, output_size=32, attention_heads=2, linear_units=48,
        num_blocks=1, input_layer="conv2d2", perceiver_mult=2),
)


@pytest.fixture(scope="module")
def setup():
    model = UnifiedVoice(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 5), dtype=jnp.int32), jnp.asarray([5]),
                        jnp.zeros((1, 7), dtype=jnp.int32),
                        jnp.asarray([7]), method=UnifiedVoice.init_all)
    qparams = quantize_gpt_params(params)
    pack = pack_gpt(qparams, CFG.layers)
    return model, qparams, pack


def test_pack_shapes_and_contents(setup):
    model, qparams, pack = setup
    d, l = CFG.model_dim, CFG.layers
    assert pack.w.shape == (l, 12, d, d) and pack.w.dtype == jnp.int8
    assert pack.consts.shape == (l, 28, d)

    h0 = qparams["params"]["gpt"]["h_0"]
    # qkv column tile 1 == W[:, d:2d]
    np.testing.assert_array_equal(np.asarray(pack.w[0, 1]),
                                  np.asarray(h0["attn_c_attn"]["weight"][:, d:2 * d]))
    # proj tile
    np.testing.assert_array_equal(np.asarray(pack.w[0, 3]),
                                  np.asarray(h0["attn_c_proj"]["weight"]))
    # fc2 row tile 2 == W[2d:3d, :]
    np.testing.assert_array_equal(np.asarray(pack.w[0, 10]),
                                  np.asarray(h0["mlp_c_proj"]["weight"][2 * d:3 * d]))
    # scale row for qkv tile 1 == scale[:, d:2d]
    np.testing.assert_allclose(np.asarray(pack.consts[0, 1]),
                               np.asarray(h0["attn_c_attn"]["scale"][0, d:2 * d],
                                          np.float32), rtol=1e-6)
    # fc2 partial-tile biases are zero, final tile carries the bias
    assert float(jnp.abs(pack.consts[0, 20:23]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(pack.consts[0, 23]),
                               np.asarray(h0["mlp_c_proj"]["bias"], np.float32),
                               rtol=1e-6)
    # LN rows
    np.testing.assert_allclose(np.asarray(pack.consts[0, 24]),
                               np.asarray(h0["ln_1"]["weight"], np.float32),
                               rtol=1e-6)


def _prefill(model, params, b=1, bl=8, max_new=8):
    """Build prompt + prefilled cache exactly like decode() does."""
    cfg = CFG
    p = cfg.condition_num_latent + 2 + bl + 2
    t_max = p + 1 + max_new
    t_max += (-t_max) % BLOCK_T

    rng = jax.random.PRNGKey(1)
    cond = jax.random.normal(rng, (b, cfg.condition_num_latent, cfg.model_dim),
                             jnp.bfloat16)
    emo = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.model_dim),
                            jnp.bfloat16)
    text = jnp.asarray([[3, 5, 7, 2, 9, 4, 0, 0]], dtype=jnp.int32)
    tlen = jnp.asarray([6])

    prompt, valid_p = model.apply(params, cond, emo, text, tlen,
                                  method=UnifiedVoice.build_prompt)
    valid = jnp.concatenate(
        [valid_p, jnp.ones((b, t_max - p), dtype=bool)], axis=1)
    hd = cfg.model_dim // cfg.heads
    cache0 = jnp.zeros((cfg.layers, 2, b, cfg.heads, hd, t_max),
                       dtype=prompt.dtype)
    logits0, cache = model.apply(params, prompt, valid_p, cache0,
                                 method=UnifiedVoice.prefill)
    return p, t_max, valid, logits0, cache


def test_fused_step_matches_xla(setup):
    """3 sequential greedy steps: fused trunk logits/cache track the XLA
    path within bf16-accumulation tolerance."""
    model, qparams, pack = setup
    p, t_max, valid, logits0, cache = _prefill(model, qparams)
    bias = jnp.where(valid[0, :, None], 0.0, -1e30).astype(jnp.float32)

    tok_x = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    tok_f = tok_x
    cache_x = cache
    cache_f = cache_to_time_major(cache)
    for step in range(1, 4):
        step_a = jnp.asarray(step)
        logits_x, cache_x = model.apply(
            qparams, tok_x, step_a - 1, p + step_a, valid, cache_x,
            method=UnifiedVoice.decode_step)

        emb = model.apply(qparams, tok_f, step_a - 1,
                          method=UnifiedVoice.embed_decode_token)
        hidden, kv_new = fused_decode_step(emb, pack, cache_f, bias,
                                           p + step_a, CFG.heads,
                                           interpret=True)
        cache_f = apply_kv_update(cache_f, kv_new, p + step_a)
        logits_f = model.apply(qparams, hidden, method=UnifiedVoice.readout)

        lx = np.asarray(logits_x, np.float32)
        lf = np.asarray(logits_f, np.float32)
        np.testing.assert_allclose(lf, lx, rtol=0, atol=0.05 * np.abs(lx).max())
        # the written kv column matches (time-major vs head-major layouts)
        cx = np.asarray(cache_x[:, :, 0, :, :, p + step],
                        np.float32).reshape(CFG.layers, 2, -1)
        cf = np.asarray(cache_f[:, :, 0, p + step, :],
                        np.float32).reshape(CFG.layers, 2, -1)
        np.testing.assert_allclose(cf, cx, rtol=0.05, atol=0.05)
        # greedy tokens agree -> both paths continue from identical state
        assert int(jnp.argmax(logits_x, -1)[0]) == int(jnp.argmax(logits_f, -1)[0])
        tok_x = jnp.argmax(logits_x, axis=-1).astype(jnp.int32)
        tok_f = jnp.argmax(logits_f, axis=-1).astype(jnp.int32)


def test_merged_stages_match_unmerged(setup):
    """`merge_stages=True` (grid (L,4), 3 tiles/step) produces the same
    hidden state and kv rows as the tile-per-step kernel — the tile order
    and math are identical, only the grid grouping changes."""
    model, qparams, pack = setup
    p, t_max, valid, logits0, cache = _prefill(model, qparams)
    bias = jnp.where(valid[0, :, None], 0.0, -1e30).astype(jnp.float32)
    cache_tm = cache_to_time_major(cache)
    tok = jnp.asarray([3], jnp.int32)
    step = jnp.asarray(1)
    emb = model.apply(qparams, tok, step - 1,
                      method=UnifiedVoice.embed_decode_token)
    hid1, kv1 = fused_decode_step(emb, pack, cache_tm, bias, p + step,
                                  CFG.heads, interpret=True)
    hid3, kv3 = fused_decode_step(emb, pack, cache_tm, bias, p + step,
                                  CFG.heads, interpret=True,
                                  merge_stages=True)
    np.testing.assert_allclose(np.asarray(hid3), np.asarray(hid1),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kv3, np.float32),
                               np.asarray(kv1, np.float32),
                               rtol=1e-6, atol=1e-5)


def test_merged_stages_match_unmerged_int4(setup):
    """Merged grid parity for the int4 pack (both dequant schemes)."""
    from voice_tts_tpu.ops.fused_decode import pack_gpt_int4

    model, qparams, pack = setup
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 5), dtype=jnp.int32), jnp.asarray([5]),
                        jnp.zeros((1, 7), dtype=jnp.int32),
                        jnp.asarray([7]), method=UnifiedVoice.init_all)
    p4 = pack_gpt_int4(params, CFG.layers)
    p, t_max, valid, logits0, cache = _prefill(model, qparams)
    bias = jnp.where(valid[0, :, None], 0.0, -1e30).astype(jnp.float32)
    cache_tm = cache_to_time_major(cache)
    tok = jnp.asarray([3], jnp.int32)
    step = jnp.asarray(1)
    emb = model.apply(qparams, tok, step - 1,
                      method=UnifiedVoice.embed_decode_token)
    for expand, tpg in ((False, 3), (True, 3), (False, 6), ("i8sh", 3)):
        hid1, kv1 = fused_decode_step(emb, p4, cache_tm, bias, p + step,
                                      CFG.heads, interpret=True,
                                      int4_expand=expand)
        hid3, kv3 = fused_decode_step(emb, p4, cache_tm, bias, p + step,
                                      CFG.heads, interpret=True,
                                      int4_expand=expand, merge_stages=tpg)
        np.testing.assert_allclose(np.asarray(hid3), np.asarray(hid1),
                                   rtol=1e-6, atol=1e-5)
        np.testing.assert_allclose(np.asarray(kv3, np.float32),
                                   np.asarray(kv1, np.float32),
                                   rtol=1e-6, atol=1e-5)


def test_int4_pack_roundtrip(setup):
    """Dequantized int4 tiles reconstruct the f32 weights within the g128
    RTN quantization error bound (scale/2 per element)."""
    from voice_tts_tpu.ops.fused_decode import GROUP, pack_gpt_int4

    model, qparams, pack = setup
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 5), dtype=jnp.int32), jnp.asarray([5]),
                        jnp.zeros((1, 7), dtype=jnp.int32),
                        jnp.asarray([7]), method=UnifiedVoice.init_all)
    p4 = pack_gpt_int4(params, CFG.layers)
    d = CFG.model_dim
    assert p4.w.shape == (CFG.layers, 12, d // 2, d)
    assert p4.gscales.shape == (CFG.layers, 12, d // GROUP, d)

    # reconstruct tile 1 (qkv column tile for k) of layer 0
    wq = np.asarray(p4.w[0, 1], np.int32)
    lo = ((wq & 15) ^ 8) - 8
    hi = wq >> 4
    q = np.concatenate([lo, hi], axis=0).astype(np.float32)   # (D, D)
    scales = np.asarray(p4.gscales[0, 1], np.float32)          # (G, D)
    deq = q * np.repeat(scales, GROUP, axis=0)
    ref = np.asarray(
        params["params"]["gpt"]["h_0"]["attn_c_attn"]["weight"][:, d:2 * d],
        np.float32)
    err = np.abs(deq - ref)
    bound = np.repeat(scales, GROUP, axis=0) * 0.5 + 1e-8
    assert (err <= bound + 1e-6).mean() > 0.999, err.max()
    # biases ride in consts rows 12-23 like the int8 pack
    np.testing.assert_allclose(
        np.asarray(p4.consts[0, 13]),
        np.asarray(params["params"]["gpt"]["h_0"]["attn_c_attn"]["bias"],
                   np.float32).reshape(3, -1)[1], rtol=1e-6)


@pytest.mark.parametrize("expand", [False, True, "i8sh"])
def test_int4_step_matches_dequantized_xla(setup, expand):
    """The int4 megakernel step == the XLA decode path running the EXACT
    dequantized int4 weights (isolates kernel math from quantization error:
    any unpack/scale-indexing bug would blow past bf16 tolerance).
    Covers both dequant schemes: per-group sub-dots and the MXU-expanded
    whole-tile dequant (`int4_expand`)."""
    from voice_tts_tpu.ops.fused_decode import GROUP, pack_gpt_int4

    model, qparams, pack = setup
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 5), dtype=jnp.int32), jnp.asarray([5]),
                        jnp.zeros((1, 7), dtype=jnp.int32),
                        jnp.asarray([7]), method=UnifiedVoice.init_all)
    p4 = pack_gpt_int4(params, CFG.layers)
    d = CFG.model_dim

    w4 = np.asarray(p4.w, np.int32)
    lo = ((w4 & 15) ^ 8) - 8
    hi = w4 >> 4
    q = np.concatenate([lo, hi], axis=2).astype(np.float32)
    deq = q * np.repeat(np.asarray(p4.gscales, np.float32), GROUP, axis=2)

    pd = jax.device_get(jax.tree.map(lambda x: x, params))
    tree = pd["params"]["gpt"]
    for i in range(CFG.layers):
        h = tree[f"h_{i}"]
        h["attn_c_attn"]["weight"] = np.concatenate(
            [deq[i, t] for t in range(3)], axis=1)
        h["attn_c_proj"]["weight"] = deq[i, 3]
        h["mlp_c_fc"]["weight"] = np.concatenate(
            [deq[i, 4 + j] for j in range(4)], axis=1)
        h["mlp_c_proj"]["weight"] = np.concatenate(
            [deq[i, 8 + j] for j in range(4)], axis=0)
    pdeq = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if getattr(x, "dtype", None) == np.float32 else jnp.asarray(x), pd)

    p, t_max, valid, logits0, cache = _prefill(model, qparams)
    bias = jnp.where(valid[0, :, None], 0.0, -1e30).astype(jnp.float32)
    cache_tm = cache_to_time_major(cache)
    tok = jnp.asarray([3], jnp.int32)
    step = jnp.asarray(1)

    logits_ref, _ = model.apply(pdeq, tok, step - 1, p + step, valid, cache,
                                method=UnifiedVoice.decode_step)
    emb = model.apply(qparams, tok, step - 1,
                      method=UnifiedVoice.embed_decode_token)
    hid, _ = fused_decode_step(emb, p4, cache_tm, bias, p + step, CFG.heads,
                               interpret=True, int4_expand=expand)
    logits_4 = model.apply(qparams, hid, method=UnifiedVoice.readout)

    lr = np.asarray(logits_ref, np.float32)
    l4 = np.asarray(logits_4, np.float32)
    tol = 0.02 * np.abs(lr).max()
    assert np.abs(lr - l4).max() < tol
    if expand is not True:
        # per-group schemes (mask or i8sh unpack) scale after the dot:
        # argmax matches exactly
        assert int(lr.argmax()) == int(l4.argmax())
    elif int(lr.argmax()) != int(l4.argmax()):
        # expand rounds lo*scale to bf16, so reference logits within tol
        # of each other may swap order — allow only near-tie flips
        assert lr[0, l4.argmax()] > lr.max() - tol


def test_int4_full_decode_runs(setup):
    """decode() with the int4 pack produces a valid code sequence."""
    from voice_tts_tpu.ops.fused_decode import pack_gpt_int4

    model, qparams, pack = setup
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 5), dtype=jnp.int32), jnp.asarray([5]),
                        jnp.zeros((1, 7), dtype=jnp.int32),
                        jnp.asarray([7]), method=UnifiedVoice.init_all)
    p4 = pack_gpt_int4(params, CFG.layers)
    gen = GenerationConfig(do_sample=False, num_beams=1,
                           repetition_penalty=10.0)
    cond = jax.random.normal(jax.random.PRNGKey(1),
                             (1, CFG.condition_num_latent, CFG.model_dim),
                             jnp.bfloat16)
    emo = jax.random.normal(jax.random.PRNGKey(2), (1, CFG.model_dim),
                            jnp.bfloat16)
    text = jnp.asarray([[3, 5, 7, 2, 9, 4, 0, 0]], dtype=jnp.int32)
    res4 = decode(qparams, model, gen, cond, emo, text, jnp.asarray([6]),
                  jax.random.PRNGKey(3), 12, fused_pack=p4)
    codes = np.asarray(res4.codes)
    assert codes.shape == (1, 12)
    assert codes.min() >= 0 and codes.max() < CFG.number_mel_codes


def test_int8_kv_roundtrip_and_step(setup):
    """quantize_kv_cache dequantizes within scale/2 per element, and the
    int8-KV fused step tracks the f32-cache fused step closely."""
    from voice_tts_tpu.ops.fused_decode import (apply_kv_update_q,
                                                quantize_kv_cache)

    model, qparams, pack = setup
    p, t_max, valid, logits0, cache = _prefill(model, qparams)
    bias = jnp.where(valid[0, :, None], 0.0, -1e30).astype(jnp.float32)
    cache_tm = cache_to_time_major(cache)

    qc, scales = quantize_kv_cache(cache_tm)
    assert qc.dtype == jnp.int8 and scales.shape == (CFG.layers, t_max, 2)
    deq = (np.asarray(qc, np.float32)
           * np.asarray(scales, np.float32).transpose(0, 2, 1)[:, :, None, :, None])
    orig = np.asarray(cache_tm, np.float32)
    bound = np.asarray(scales, np.float32).transpose(0, 2, 1)[:, :, None, :, None]
    assert (np.abs(deq - orig) <= bound * 0.5 * (1 + 1e-5) + 1e-8).all()

    tok = jnp.asarray([3], jnp.int32)
    step = jnp.asarray(1)
    emb = model.apply(qparams, tok, step - 1,
                      method=UnifiedVoice.embed_decode_token)
    hid_f, kv_f = fused_decode_step(emb, pack, cache_tm, bias, p + step,
                                    CFG.heads, interpret=True)
    hid_q, kv_q = fused_decode_step(emb, pack, qc, bias, p + step, CFG.heads,
                                    interpret=True, kv_scales=scales)
    assert kv_q.dtype == jnp.float32
    hf = np.asarray(hid_f, np.float32)
    hq = np.asarray(hid_q, np.float32)
    np.testing.assert_allclose(hq, hf, rtol=0, atol=0.05 * np.abs(hf).max())
    # the new-token rows are computed from full-precision inputs both ways
    np.testing.assert_allclose(np.asarray(kv_q), np.asarray(kv_f, np.float32),
                               rtol=0.05, atol=0.05)

    qc2, sc2 = apply_kv_update_q(qc, scales, kv_q, p + step)
    row = (np.asarray(qc2[:, :, 0, p + 1, :], np.float32)
           * np.asarray(sc2[:, p + 1, :], np.float32).transpose(0, 1)[:, :, None])
    np.testing.assert_allclose(row, np.asarray(kv_q, np.float32),
                               rtol=0, atol=np.asarray(
                                   sc2[:, p + 1, :]).max() * 0.51 + 1e-8)


def test_int8_kv_full_decode_greedy(setup):
    """decode(int8_kv=True) reproduces the f32-cache fused greedy codes on
    the tiny model (KV8 error ≪ the greedy decision margins here)."""
    model, qparams, pack = setup
    gen = GenerationConfig(do_sample=False, num_beams=1,
                           repetition_penalty=10.0)
    cond = jax.random.normal(jax.random.PRNGKey(1),
                             (1, CFG.condition_num_latent, CFG.model_dim),
                             jnp.bfloat16)
    emo = jax.random.normal(jax.random.PRNGKey(2), (1, CFG.model_dim),
                            jnp.bfloat16)
    text = jnp.asarray([[3, 5, 7, 2, 9, 4, 0, 0]], dtype=jnp.int32)
    tlen = jnp.asarray([6])
    rng = jax.random.PRNGKey(3)

    res_f = decode(qparams, model, gen, cond, emo, text, tlen, rng, 12,
                   fused_pack=pack)
    res_q = decode(qparams, model, gen, cond, emo, text, tlen, rng, 12,
                   fused_pack=pack, int8_kv=True)
    np.testing.assert_array_equal(np.asarray(res_q.codes),
                                  np.asarray(res_f.codes))


def _prefill_batch(model, params, b=2, bl=8, max_new=8):
    """Batched prompt + prefilled cache exactly like decode() builds them."""
    cfg = CFG
    p = cfg.condition_num_latent + 2 + bl + 2
    t_max = p + 1 + max_new
    t_max += (-t_max) % BLOCK_T

    cond = jax.random.normal(jax.random.PRNGKey(1),
                             (b, cfg.condition_num_latent, cfg.model_dim),
                             jnp.bfloat16)
    emo = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.model_dim),
                            jnp.bfloat16)
    text = jnp.asarray([[3, 5, 7, 2, 9, 4, 0, 0],
                        [8, 1, 6, 0, 0, 0, 0, 0]][:b], dtype=jnp.int32)
    tlen = jnp.asarray([6, 3][:b])

    prompt, valid_p = model.apply(params, cond, emo, text, tlen,
                                  method=UnifiedVoice.build_prompt)
    valid = jnp.concatenate(
        [valid_p, jnp.ones((b, t_max - p), dtype=bool)], axis=1)
    hd = cfg.model_dim // cfg.heads
    cache0 = jnp.zeros((cfg.layers, 2, b, cfg.heads, hd, t_max),
                       dtype=prompt.dtype)
    logits0, cache = model.apply(params, prompt, valid_p, cache0,
                                 method=UnifiedVoice.prefill)
    return p, t_max, valid, logits0, cache, (cond, emo, text, tlen)


def test_fused_batch_step_matches_xla(setup):
    """3 sequential greedy steps at batch 2 (rows with different prompt
    padding): the batched megakernel tracks the XLA path per row."""
    from voice_tts_tpu.ops.fused_decode import (apply_kv_update_batch,
                                                fused_decode_step_batch)

    model, qparams, pack = setup
    p, t_max, valid, logits0, cache, _ = _prefill_batch(model, qparams)
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)

    tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    cache_x = cache
    cache_f = cache_to_time_major(cache)
    for step in range(1, 4):
        step_a = jnp.asarray(step)
        logits_x, cache_x = model.apply(
            qparams, tok, step_a - 1, p + step_a, valid, cache_x,
            method=UnifiedVoice.decode_step)

        emb = model.apply(qparams, tok, step_a - 1,
                          method=UnifiedVoice.embed_decode_token)
        hidden, kv_new = fused_decode_step_batch(emb, pack, cache_f, bias,
                                                 p + step_a, CFG.heads,
                                                 interpret=True)
        cache_f = apply_kv_update_batch(cache_f, kv_new, p + step_a)
        logits_f = model.apply(qparams, hidden, method=UnifiedVoice.readout)

        lx = np.asarray(logits_x, np.float32)
        lf = np.asarray(logits_f, np.float32)
        np.testing.assert_allclose(lf, lx, rtol=0, atol=0.05 * np.abs(lx).max())
        # written kv rows match per batch row (layout transposed)
        cx = np.asarray(cache_x[:, :, :, :, :, p + step],
                        np.float32).reshape(CFG.layers, 2, 2, -1)
        cf = np.asarray(cache_f[:, :, :, p + step, :],
                        np.float32).reshape(CFG.layers, 2, 2, -1)
        np.testing.assert_allclose(cf, cx, rtol=0.05, atol=0.05)
        assert (np.asarray(jnp.argmax(logits_x, -1))
                == np.asarray(jnp.argmax(logits_f, -1))).all()
        tok = jnp.argmax(logits_x, axis=-1).astype(jnp.int32)


def test_fused_batch_per_row_pos(setup):
    """Rows decoding at DIFFERENT positions (continuous batching): each row
    of the batched kernel matches an independent batch-1 megakernel step on
    that row's cache slice, and per-row cache writes land at each row's own
    position."""
    from voice_tts_tpu.ops.fused_decode import (apply_kv_update_rows,
                                                fused_decode_step_batch)

    model, qparams, pack = setup
    p, t_max, valid, logits0, cache, _ = _prefill_batch(model, qparams)
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)
    cache_f = cache_to_time_major(cache)

    # advance row 0 by one extra step so the rows sit at different positions
    tok0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    emb0 = model.apply(qparams, tok0[:1], jnp.asarray(0),
                       method=UnifiedVoice.embed_decode_token)
    cache_r0 = cache_f[:, :, :1]
    hid0, kv0 = fused_decode_step(emb0, pack, cache_r0, bias[0][:, None],
                                  p + 1, CFG.heads, interpret=True)
    cache_r0 = apply_kv_update(cache_r0, kv0, p + 1)
    tok0_next = jnp.argmax(model.apply(qparams, hid0,
                                       method=UnifiedVoice.readout),
                           axis=-1).astype(jnp.int32)

    # batched state: row 0 at pos p+2 (about to emit its 2nd code), row 1 at
    # pos p+1 (its 1st)
    cache_b = jnp.concatenate([cache_r0, cache_f[:, :, 1:]], axis=2)
    pos = jnp.asarray([p + 2, p + 1], jnp.int32)
    emb_r0 = model.apply(qparams, tok0_next, jnp.asarray(1),
                         method=UnifiedVoice.embed_decode_token)
    emb_r1 = model.apply(qparams, tok0[1:], jnp.asarray(0),
                         method=UnifiedVoice.embed_decode_token)
    emb = jnp.concatenate([emb_r0, emb_r1], axis=0)
    hid_b, kv_b = fused_decode_step_batch(emb, pack, cache_b, bias, pos,
                                          CFG.heads, interpret=True)

    # references: independent batch-1 steps per row
    hid_ref0, kv_ref0 = fused_decode_step(emb_r0, pack, cache_r0,
                                          bias[0][:, None], p + 2, CFG.heads,
                                          interpret=True)
    hid_ref1, kv_ref1 = fused_decode_step(emb_r1, pack, cache_f[:, :, 1:],
                                          bias[1][:, None], p + 1, CFG.heads,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(hid_b[0]), np.asarray(hid_ref0[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hid_b[1]), np.asarray(hid_ref1[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(kv_b[:, :, 0], np.float32),
                               np.asarray(kv_ref0, np.float32),
                               rtol=1e-4, atol=1e-4)

    cache_up = apply_kv_update_rows(cache_b, kv_b, pos)
    np.testing.assert_allclose(
        np.asarray(cache_up[:, :, 0, p + 2, :], np.float32),
        np.asarray(kv_b[:, :, 0], np.float32), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(cache_up[:, :, 1, p + 1, :], np.float32),
        np.asarray(kv_b[:, :, 1], np.float32), rtol=1e-3, atol=1e-3)
    # row 0's p+1 entry (written before the batched step) is untouched
    np.testing.assert_array_equal(np.asarray(cache_up[:, :, 0, p + 1, :]),
                                  np.asarray(cache_b[:, :, 0, p + 1, :]))


def test_fused_batch_idle_slot_nan_free(setup):
    """pos = 0 idle slots produce finite garbage, and occupied rows are
    unaffected — the continuous batcher relies on this."""
    from voice_tts_tpu.ops.fused_decode import fused_decode_step_batch

    model, qparams, pack = setup
    p, t_max, valid, logits0, cache, _ = _prefill_batch(model, qparams)
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)
    cache_f = cache_to_time_major(cache)
    tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    emb = model.apply(qparams, tok, jnp.asarray(0),
                      method=UnifiedVoice.embed_decode_token)

    pos = jnp.asarray([p + 1, 0], jnp.int32)   # row 1 idle
    hid_b, kv_b = fused_decode_step_batch(emb, pack, cache_f, bias, pos,
                                          CFG.heads, interpret=True)
    assert np.isfinite(np.asarray(hid_b)).all()
    assert np.isfinite(np.asarray(kv_b, np.float32)).all()
    hid_ref, _ = fused_decode_step(emb[:1], pack, cache_f[:, :, :1],
                                   bias[0][:, None], p + 1, CFG.heads,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(hid_b[0]), np.asarray(hid_ref[0]),
                               rtol=1e-4, atol=1e-4)


def test_fused_batch_int8_kv_step(setup):
    """The int8-KV batched step tracks the float-cache batched step."""
    from voice_tts_tpu.ops.fused_decode import (apply_kv_update_q_batch,
                                                fused_decode_step_batch,
                                                quantize_kv_cache_batch)

    model, qparams, pack = setup
    p, t_max, valid, logits0, cache, _ = _prefill_batch(model, qparams)
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)
    cache_f = cache_to_time_major(cache)
    qc, scales = quantize_kv_cache_batch(cache_f)
    assert qc.dtype == jnp.int8 and scales.shape == (CFG.layers, 2, t_max, 2)

    tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    step = jnp.asarray(1)
    emb = model.apply(qparams, tok, step - 1,
                      method=UnifiedVoice.embed_decode_token)
    hid_f, kv_f = fused_decode_step_batch(emb, pack, cache_f, bias, p + step,
                                          CFG.heads, interpret=True)
    hid_q, kv_q = fused_decode_step_batch(emb, pack, qc, bias, p + step,
                                          CFG.heads, interpret=True,
                                          kv_scales=scales)
    assert kv_q.dtype == jnp.float32
    hf = np.asarray(hid_f, np.float32)
    hq = np.asarray(hid_q, np.float32)
    np.testing.assert_allclose(hq, hf, rtol=0, atol=0.05 * np.abs(hf).max())
    np.testing.assert_allclose(np.asarray(kv_q), np.asarray(kv_f, np.float32),
                               rtol=0.05, atol=0.05)

    qc2, sc2 = apply_kv_update_q_batch(qc, scales, kv_q, p + step)
    row = (np.asarray(qc2[:, :, :, p + 1, :], np.float32)
           * np.asarray(sc2[:, :, p + 1, :], np.float32)
           .transpose(0, 2, 1)[:, :, :, None])
    np.testing.assert_allclose(
        row, np.asarray(kv_q, np.float32), rtol=0,
        atol=float(np.asarray(sc2[:, :, p + 1, :]).max()) * 0.51 + 1e-8)


def test_fused_batch_full_decode_greedy(setup):
    """decode(fused_batch=True) at batch 2 reproduces the XLA greedy codes,
    including per-row early stop bookkeeping."""
    model, qparams, pack = setup
    gen = GenerationConfig(do_sample=False, num_beams=1,
                           repetition_penalty=10.0)
    b = 2
    cond = jax.random.normal(jax.random.PRNGKey(1),
                             (b, CFG.condition_num_latent, CFG.model_dim),
                             jnp.bfloat16)
    emo = jax.random.normal(jax.random.PRNGKey(2), (b, CFG.model_dim),
                            jnp.bfloat16)
    text = jnp.asarray([[3, 5, 7, 2, 9, 4, 0, 0],
                        [8, 1, 6, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    tlen = jnp.asarray([6, 3])
    rng = jax.random.PRNGKey(3)

    res_x = decode(qparams, model, gen, cond, emo, text, tlen, rng, 12)
    res_f = decode(qparams, model, gen, cond, emo, text, tlen, rng, 12,
                   fused_pack=pack, fused_batch=True)
    np.testing.assert_array_equal(np.asarray(res_f.codes),
                                  np.asarray(res_x.codes))
    np.testing.assert_array_equal(np.asarray(res_f.lengths),
                                  np.asarray(res_x.lengths))
    res_q = decode(qparams, model, gen, cond, emo, text, tlen, rng, 12,
                   fused_pack=pack, fused_batch=True, int8_kv=True)
    np.testing.assert_array_equal(np.asarray(res_q.codes),
                                  np.asarray(res_x.codes))


def test_fused_beam_matches_xla(setup):
    """beam_decode with the megakernel reproduces the XLA beam path exactly
    (beams share the position; only the cache-row reorder differs).  Covers
    the reference DEFAULT config num_beams=3, plus the int8-KV variant."""
    from voice_tts_tpu.models.gpt.beam import beam_decode

    model, qparams, pack = setup
    gen = GenerationConfig(do_sample=False, num_beams=3,
                           repetition_penalty=10.0)
    cond = jax.random.normal(jax.random.PRNGKey(1),
                             (1, CFG.condition_num_latent, CFG.model_dim),
                             jnp.bfloat16)
    emo = jax.random.normal(jax.random.PRNGKey(2), (1, CFG.model_dim),
                            jnp.bfloat16)
    text = jnp.asarray([[3, 5, 7, 2, 9, 4, 0, 0]], dtype=jnp.int32)
    tlen = jnp.asarray([6])
    rng = jax.random.PRNGKey(3)

    res_x = beam_decode(qparams, model, gen, cond, emo, text, tlen, rng, 12)
    res_f = beam_decode(qparams, model, gen, cond, emo, text, tlen, rng, 12,
                        fused_pack=pack)
    np.testing.assert_array_equal(np.asarray(res_f.codes),
                                  np.asarray(res_x.codes))
    np.testing.assert_array_equal(np.asarray(res_f.lengths),
                                  np.asarray(res_x.lengths))
    res_q = beam_decode(qparams, model, gen, cond, emo, text, tlen, rng, 12,
                        fused_pack=pack, int8_kv=True)
    np.testing.assert_array_equal(np.asarray(res_q.codes),
                                  np.asarray(res_x.codes))


def test_request_batched_beam_matches_sequential(setup):
    """`beam_decode_fused_batch` (R requests x K beams in ONE R*K-row
    megakernel) reproduces the sequential per-request fused beam decode
    bit-for-bit — rows are independent in the kernel (grouped ancestor
    tables never cross a request boundary, and the forced bt=128 block
    length matches the K-row call's), so feeding each request the key the
    sequential path would use must give identical codes.  Covers greedy,
    beam SAMPLING (the reference default), and the int8-KV variant."""
    from voice_tts_tpu.models.gpt.beam import (beam_decode,
                                               beam_decode_fused_batch)

    model, qparams, pack = setup
    cond = jax.random.normal(jax.random.PRNGKey(1),
                             (2, CFG.condition_num_latent, CFG.model_dim),
                             jnp.bfloat16)
    emo = jax.random.normal(jax.random.PRNGKey(2), (2, CFG.model_dim),
                            jnp.bfloat16)
    text = jnp.asarray([[3, 5, 7, 2, 9, 4, 0, 0],
                        [8, 1, 2, 6, 0, 0, 0, 0]], dtype=jnp.int32)
    tlen = jnp.asarray([6, 4])
    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(3), i)
                      for i in range(2)])

    for gen, int8_kv in [
        (GenerationConfig(do_sample=False, num_beams=3,
                          repetition_penalty=10.0), False),
        (GenerationConfig(do_sample=True, num_beams=3, top_k=30, top_p=0.8,
                          temperature=0.8, repetition_penalty=10.0), False),
        (GenerationConfig(do_sample=True, num_beams=3, top_k=30, top_p=0.8,
                          temperature=0.8, repetition_penalty=10.0), True),
    ]:
        seq = [beam_decode(qparams, model, gen, cond[i:i + 1], emo[i:i + 1],
                           text[i:i + 1], tlen[i:i + 1], keys[i], 12,
                           fused_pack=pack, int8_kv=int8_kv)
               for i in range(2)]
        bat = beam_decode_fused_batch(qparams, model, gen, cond, emo, text,
                                      tlen, keys, 12, fused_pack=pack,
                                      int8_kv=int8_kv)
        for i in range(2):
            np.testing.assert_array_equal(np.asarray(bat.codes[i]),
                                          np.asarray(seq[i].codes[0]))
            assert int(bat.lengths[i]) == int(seq[i].lengths[0])
            assert bool(bat.hit_limit[i]) == bool(seq[i].hit_limit[0])


def test_fused_batch_int4_full_decode(setup):
    """Batched decode with the int4 pack produces valid codes at batch 2."""
    from voice_tts_tpu.ops.fused_decode import pack_gpt_int4

    model, qparams, pack = setup
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 5), dtype=jnp.int32), jnp.asarray([5]),
                        jnp.zeros((1, 7), dtype=jnp.int32),
                        jnp.asarray([7]), method=UnifiedVoice.init_all)
    p4 = pack_gpt_int4(params, CFG.layers)
    gen = GenerationConfig(do_sample=False, num_beams=1,
                           repetition_penalty=10.0)
    b = 2
    cond = jax.random.normal(jax.random.PRNGKey(1),
                             (b, CFG.condition_num_latent, CFG.model_dim),
                             jnp.bfloat16)
    emo = jax.random.normal(jax.random.PRNGKey(2), (b, CFG.model_dim),
                            jnp.bfloat16)
    text = jnp.asarray([[3, 5, 7, 2, 9, 4, 0, 0],
                        [8, 1, 6, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    res4 = decode(qparams, model, gen, cond, emo, text, jnp.asarray([6, 3]),
                  jax.random.PRNGKey(3), 12, fused_pack=p4, fused_batch=True)
    codes = np.asarray(res4.codes)
    assert codes.shape == (b, 12)
    assert codes.min() >= 0 and codes.max() < CFG.number_mel_codes


def test_fused_full_decode_greedy(setup):
    """Full decode() with fused_pack produces the same greedy codes as the
    XLA int8 path (tiny model, short horizon)."""
    model, qparams, pack = setup
    gen = GenerationConfig(do_sample=False, num_beams=1,
                           repetition_penalty=10.0)
    cond = jax.random.normal(jax.random.PRNGKey(1),
                             (1, CFG.condition_num_latent, CFG.model_dim),
                             jnp.bfloat16)
    emo = jax.random.normal(jax.random.PRNGKey(2), (1, CFG.model_dim),
                            jnp.bfloat16)
    text = jnp.asarray([[3, 5, 7, 2, 9, 4, 0, 0]], dtype=jnp.int32)
    tlen = jnp.asarray([6])
    rng = jax.random.PRNGKey(3)

    res_x = decode(qparams, model, gen, cond, emo, text, tlen, rng, 12)
    res_f = decode(qparams, model, gen, cond, emo, text, tlen, rng, 12,
                   fused_pack=pack)
    assert res_f.codes.shape == res_x.codes.shape
    np.testing.assert_array_equal(np.asarray(res_f.codes),
                                  np.asarray(res_x.codes))
    np.testing.assert_array_equal(np.asarray(res_f.lengths),
                                  np.asarray(res_x.lengths))


def test_verify_matches_sequential_steps(setup):
    """Speculative-verify kernel: ONE K=4 `fused_decode_verify` call
    reproduces 4 sequential `fused_decode_step` calls — per-row hidden
    states and written kv rows match (shared-prefix + in-VMEM causal tail
    attention == step-by-step attention over a growing cache)."""
    from voice_tts_tpu.ops.fused_decode import (apply_kv_update_span,
                                                fused_decode_verify)

    model, qparams, pack = setup
    p, t_max, valid, logits0, cache = _prefill(model, qparams)
    bias = jnp.where(valid[0, :, None], 0.0, -1e30).astype(jnp.float32)

    tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    cache_f = cache_to_time_major(cache)

    # sequential reference: 4 steps, greedy chaining
    toks, hiddens, embs = [tok], [], []
    cache_seq = cache_f
    for step in range(1, 5):
        step_a = jnp.asarray(step)
        emb = model.apply(qparams, toks[-1], step_a - 1,
                          method=UnifiedVoice.embed_decode_token)
        embs.append(emb)
        hidden, kv_new = fused_decode_step(emb, pack, cache_seq, bias,
                                           p + step_a, CFG.heads,
                                           interpret=True)
        cache_seq = apply_kv_update(cache_seq, kv_new, p + step_a)
        hiddens.append(hidden)
        logits = model.apply(qparams, hidden, method=UnifiedVoice.readout)
        toks.append(jnp.argmax(logits, axis=-1).astype(jnp.int32))

    # one verify call on the same 4 tokens
    x = jnp.concatenate(embs, axis=0)                   # (4, D)
    hid_v, kv_v = fused_decode_verify(x, pack, cache_f, bias,
                                      p + 1, CFG.heads, interpret=True)
    cache_v = apply_kv_update_span(cache_f, kv_v, p + 1)

    hs = np.concatenate([np.asarray(h, np.float32) for h in hiddens])
    hv = np.asarray(hid_v, np.float32)
    np.testing.assert_allclose(hv, hs, rtol=0, atol=0.05 * np.abs(hs).max())
    cs = np.asarray(cache_seq[:, :, 0, p + 1:p + 5], np.float32)
    cv = np.asarray(cache_v[:, :, 0, p + 1:p + 5], np.float32)
    np.testing.assert_allclose(cv, cs, rtol=0.05, atol=0.05)


def test_spec_decode_greedy_matches_decode(setup):
    """Greedy self-speculative decode (draft == target pack) reproduces the
    plain fused greedy decode exactly: with an identical draft, every
    acceptance check passes via argmax equality and the emitted stream is
    the target stream."""
    from voice_tts_tpu.models.gpt.decode import decode, spec_decode

    model, qparams, pack = setup
    gen = GenerationConfig(do_sample=False, num_beams=1,
                           repetition_penalty=10.0, max_mel_tokens=12)
    rng = jax.random.PRNGKey(9)
    cond = jax.random.normal(rng, (1, CFG.condition_num_latent,
                                   CFG.model_dim)) * 0.3
    emo = jax.random.normal(jax.random.fold_in(rng, 1),
                            (1, CFG.model_dim)) * 0.1
    text = jnp.asarray([[5, 9, 3, 7, 2, 8, 4, 6]])
    tlen = jnp.asarray([8])

    ref = decode(qparams, model, gen, cond, emo, text, tlen, rng,
                 max_new=12, fused_pack=pack)
    spec = spec_decode(qparams, model, gen, cond, emo, text, tlen, rng,
                       max_new=12, pack_target=pack, pack_draft=pack,
                       k_spec=4)
    rl, sl = int(ref.lengths[0]), int(spec.lengths[0])
    assert rl == sl, (rl, sl)
    np.testing.assert_array_equal(np.asarray(ref.codes[0, :rl]),
                                  np.asarray(spec.codes[0, :sl]))


def test_spec_decode_sampling_runs(setup):
    """Sampling-mode speculative decode with an int4 draft: emits a valid
    stream, respects the cap, and the repetition-penalty presence pipeline
    doesn't diverge (smoke — distribution exactness is by construction of
    rejection sampling; greedy exactness is the test above)."""
    from voice_tts_tpu.models.gpt.decode import spec_decode
    from voice_tts_tpu.ops.fused_decode import pack_gpt_int4

    model, qparams, pack = setup
    params_f32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, qparams)
    pack4 = pack_gpt_int4(params_f32, CFG.layers)
    gen = GenerationConfig(do_sample=True, num_beams=1, top_k=30, top_p=0.8,
                           temperature=0.8, repetition_penalty=10.0,
                           max_mel_tokens=10)
    rng = jax.random.PRNGKey(3)
    cond = jax.random.normal(rng, (1, CFG.condition_num_latent,
                                   CFG.model_dim)) * 0.3
    emo = jax.random.normal(jax.random.fold_in(rng, 2),
                            (1, CFG.model_dim)) * 0.1
    text = jnp.asarray([[5, 9, 3, 7, 2, 8, 4, 6]])
    tlen = jnp.asarray([8])
    res = spec_decode(qparams, model, gen, cond, emo, text, tlen, rng,
                      max_new=10, pack_target=pack, pack_draft=pack4,
                      k_spec=4)
    n = int(res.lengths[0])
    assert 1 <= n <= 10
    codes = np.asarray(res.codes[0, :n])
    assert ((codes >= 0) & (codes < CFG.number_mel_codes)).all()


def test_readout_fold_matches_xla_readout(setup):
    """Folded final_norm+mel_head readout: hidden/kv bit-identical to the
    plain kernel; logits match the int8-dequant reference exactly (modulo
    bf16 dot rounding) and stay within the int8 quantization envelope of
    the bf16 XLA readout."""
    from voice_tts_tpu.ops.fused_decode import pack_readout

    model, qparams, pack = setup
    ro = pack_readout(qparams)
    d, l = CFG.model_dim, CFG.layers
    assert ro.w.shape[0] == 12 and ro.w.dtype == jnp.int8

    t_max = BLOCK_T
    x = jax.random.normal(jax.random.PRNGKey(1), (1, d)) * 0.1
    hd = d // CFG.heads
    cache = (jax.random.normal(jax.random.PRNGKey(2),
                               (l, 2, 1, CFG.heads, hd, t_max)) * 0.02
             ).astype(jnp.bfloat16)
    cache = cache_to_time_major(cache)
    bias = jnp.zeros((t_max, 1), jnp.float32)
    pos = jnp.asarray(17)

    h1, kv1 = fused_decode_step(x, pack, cache, bias, pos, CFG.heads,
                                interpret=True, merge_stages=3)
    h2, kv2, logits_pad = fused_decode_step(x, pack, cache, bias, pos,
                                            CFG.heads, interpret=True,
                                            merge_stages=3, readout_pack=ro)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(kv1), np.asarray(kv2))

    vocab = CFG.number_mel_codes
    logits = np.asarray(logits_pad)[:, :vocab]
    # int8-dequant reference on the same hidden
    g = qparams["params"]
    lnw = np.asarray(g["final_norm"]["weight"], np.float32)
    lnb = np.asarray(g["final_norm"]["bias"], np.float32)
    hf = np.asarray(h1, np.float32)
    hn = ((hf - hf.mean(-1, keepdims=True))
          / np.sqrt(hf.var(-1, keepdims=True) + 1e-5) * lnw + lnb)
    w = np.asarray(ro.w, np.float32)
    sc = np.asarray(ro.consts, np.float32)
    full_w = np.concatenate(list(w), axis=1)
    full_s = np.concatenate([sc[i, 0] for i in range(12)])
    full_b = np.concatenate([sc[i, 1] for i in range(12)])
    ref = ((hn @ full_w) * full_s + full_b)[:, :vocab]
    rel = np.max(np.abs(logits - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert rel < 1e-2, rel

    # quantization envelope vs the bf16 XLA readout
    true = np.asarray(model.apply(qparams, h1, method=UnifiedVoice.readout),
                      np.float32)
    qrel = np.max(np.abs(logits - true)) / (np.max(np.abs(true)) + 1e-9)
    assert qrel < 5e-2, qrel

    # full decode: greedy codes via folded readout match the unfolded fused
    # path at these weights (same trajectory; logit deltas far below the
    # greedy decision margins of the random-weight logits)
    gen = GenerationConfig(do_sample=False, num_beams=1,
                           repetition_penalty=10.0, max_mel_tokens=8)
    cond = jax.random.normal(jax.random.PRNGKey(3), (1, 4, d)) * 0.3
    emo = jax.random.normal(jax.random.PRNGKey(4), (1, d)) * 0.1
    text = jnp.ones((1, 5), jnp.int32)
    tl = jnp.asarray([5])
    r1 = decode(qparams, model, gen, cond, emo, text, tl,
                jax.random.PRNGKey(5), max_new=8, fused_pack=pack,
                merge_stages=3)
    r2 = decode(qparams, model, gen, cond, emo, text, tl,
                jax.random.PRNGKey(5), max_new=8, fused_pack=pack,
                merge_stages=3, readout_pack=ro)
    assert r2.codes.shape == r1.codes.shape


def test_readout_fold_batched_and_beam(setup):
    """Batched-kernel readout fold (beam/grouped serving): hidden/kv
    bit-identical; logits within the int8 head-quantization envelope."""
    from voice_tts_tpu.ops.fused_decode import (batch_block_t, pack_readout,
                                                fused_decode_step_batch)

    model, qparams, pack = setup
    ro = pack_readout(qparams)
    d, l = CFG.model_dim, CFG.layers
    B, t_max = 3, 256
    x = jax.random.normal(jax.random.PRNGKey(1), (B, d)) * 0.1
    hd = d // CFG.heads
    cache = (jax.random.normal(jax.random.PRNGKey(2),
                               (l, 2, B, CFG.heads, hd, t_max)) * 0.02
             ).astype(jnp.bfloat16)
    cache = cache_to_time_major(cache)
    bias = jnp.zeros((B, t_max), jnp.float32)
    src = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None],
                           (B, t_max))
    pos = jnp.asarray(17)

    h1, kv1 = fused_decode_step_batch(x, pack, cache, bias, pos, CFG.heads,
                                      interpret=True, merge_stages=3,
                                      beam_src=src)
    h2, kv2, lp = fused_decode_step_batch(x, pack, cache, bias, pos,
                                          CFG.heads, interpret=True,
                                          merge_stages=3, beam_src=src,
                                          readout_pack=ro)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(kv1), np.asarray(kv2))
    vocab = CFG.number_mel_codes
    logits = np.asarray(lp)[:, :vocab]
    true = np.asarray(model.apply(qparams, h1,
                                  method=UnifiedVoice.readout), np.float32)
    rel = np.max(np.abs(logits - true)) / (np.max(np.abs(true)) + 1e-9)
    assert rel < 5e-2, rel
