"""Pallas decode-attention kernel vs reference einsum attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voice_tts_tpu.ops.decode_attention import BLOCK_T, decode_attention


def _reference(q, k, v, bias, length):
    # q (B,H,hd); k/v (B,H,hd,T); bias (B,T)
    scores = np.einsum("bhd,bhdt->bht", q.astype(np.float64),
                       k.astype(np.float64)) / np.sqrt(q.shape[-1])
    scores = scores + bias[:, None, :]
    t = np.arange(k.shape[3])
    scores = np.where(t[None, None, :] < length, scores, -np.inf)
    scores -= scores.max(axis=-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(axis=-1, keepdims=True)
    return np.einsum("bht,bhdt->bhd", p, v.astype(np.float64)).astype(np.float32)


@pytest.mark.parametrize("length", [5, BLOCK_T, BLOCK_T + 37, 2 * BLOCK_T - 1])
def test_decode_attention_matches_reference(length):
    rng = np.random.default_rng(0)
    b, h, hd, t = 2, 4, 64, 2 * BLOCK_T
    q = rng.normal(size=(b, h, hd)).astype(np.float32)
    k = rng.normal(size=(b, h, hd, t)).astype(np.float32)
    v = rng.normal(size=(b, h, hd, t)).astype(np.float32)
    bias = np.zeros((b, t), np.float32)
    bias[0, :3] = -1e30  # padded prompt positions

    ref = _reference(q, k, v, bias, length)
    out = np.asarray(decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        jnp.asarray(length, jnp.int32), interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_decode_attention_bf16():
    rng = np.random.default_rng(1)
    b, h, hd, t = 1, 4, 64, BLOCK_T
    q = rng.normal(size=(b, h, hd)).astype(np.float32)
    k = rng.normal(size=(b, h, hd, t)).astype(np.float32)
    v = rng.normal(size=(b, h, hd, t)).astype(np.float32)
    bias = np.zeros((b, t), np.float32)
    ref = _reference(q, k, v, bias, 100)
    out = np.asarray(decode_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(bias),
        jnp.asarray(100, jnp.int32), interpret=True)).astype(np.float32)
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)


def test_decode_with_pallas_attention_matches_xla():
    """Greedy decode with the Pallas attention path == XLA path (tiny cfg)."""
    import dataclasses

    from voice_tts_tpu.config import GenerationConfig
    from voice_tts_tpu.models.gpt import UnifiedVoice
    from voice_tts_tpu.models.gpt.decode import decode as gpt_decode
    from tests.test_gpt import TINY

    cfg_x = TINY
    cfg_p = dataclasses.replace(TINY, pallas_decode_attention=True)

    rng = np.random.default_rng(9)
    text = rng.integers(2, 30, size=(1, 7)).astype(np.int32)
    model_x = UnifiedVoice(cfg_x)
    params = model_x.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 1024)),
                          jnp.zeros((1, 6, 1024)), jnp.asarray(text),
                          jnp.asarray([7]), jnp.zeros((1, 5), dtype=jnp.int32),
                          jnp.asarray([5]), method=UnifiedVoice.init_all)
    cond = jnp.asarray(rng.normal(size=(1, 4, cfg_x.model_dim)).astype(np.float32) * 0.1)
    emovec = jnp.asarray(rng.normal(size=(1, cfg_x.model_dim)).astype(np.float32) * 0.1)
    gen = GenerationConfig(do_sample=False, repetition_penalty=2.0, num_beams=1)

    res_x = gpt_decode(params, model_x, gen, cond, emovec, jnp.asarray(text),
                       jnp.asarray([7], dtype=jnp.int32), jax.random.PRNGKey(1),
                       max_new=8)
    model_p = UnifiedVoice(cfg_p)
    res_p = gpt_decode(params, model_p, gen, cond, emovec, jnp.asarray(text),
                       jnp.asarray([7], dtype=jnp.int32), jax.random.PRNGKey(1),
                       max_new=8)
    lx = int(np.asarray(res_x.lengths)[0])
    lp = int(np.asarray(res_p.lengths)[0])
    assert lx == lp
    np.testing.assert_array_equal(np.asarray(res_x.codes)[0, :lx],
                                  np.asarray(res_p.codes)[0, :lp])
