"""Continuous batching: slot admit/chunk decode parity + scheduler e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voice_tts_tpu.config import ConformerConfig, GPTConfig, GenerationConfig
from voice_tts_tpu.engine.continuous import (ContinuousBatcher, admit,
                                             init_state, run_chunk)
from voice_tts_tpu.models.gpt import UnifiedVoice
from voice_tts_tpu.models.gpt.decode import decode
from voice_tts_tpu.ops.fused_decode import BLOCK_T, pack_gpt
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

GEN = GenerationConfig(do_sample=False, num_beams=1, repetition_penalty=10.0)


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


def _request(seed, text_ids, bl=8):
    cond = jax.random.normal(jax.random.PRNGKey(seed),
                             (1, CFG.condition_num_latent, CFG.model_dim),
                             jnp.bfloat16)
    emo = jax.random.normal(jax.random.PRNGKey(seed + 100),
                            (1, CFG.model_dim), jnp.bfloat16)
    text = np.zeros((1, bl), np.int32)
    text[0, :len(text_ids)] = text_ids
    return cond, emo, jnp.asarray(text), jnp.asarray([len(text_ids)])


@pytest.mark.parametrize("int8_kv", [False, True])
def test_staggered_slots_match_decode(setup, int8_kv):
    """Two requests admitted at different times into a shared slot pool
    produce exactly the greedy codes of independent decode() calls — the
    core continuous-batching invariant (mid-flight admission must not
    perturb running slots)."""
    model, qparams, pack = setup
    max_new, bl = 12, 8
    p = CFG.condition_num_latent + 2 + bl + 2
    t_max = p + 1 + max_new
    t_max += (-t_max) % BLOCK_T

    req_a = _request(1, [3, 5, 7, 2, 9, 4])
    req_b = _request(2, [8, 1, 6])

    refs = []
    for cond, emo, text, tlen in (req_a, req_b):
        refs.append(decode(qparams, model, GEN, cond, emo, text, tlen,
                           jax.random.PRNGKey(0), max_new, fused_pack=pack,
                           int8_kv=int8_kv))

    state = init_state(CFG, 2, t_max, max_new, jnp.float32, int8_kv)
    rng = jax.random.PRNGKey(0)
    state = admit(qparams, model, GEN, state, jnp.asarray(0), *req_a, rng)
    # A decodes alone for one chunk, then B joins mid-flight
    state, status = run_chunk(qparams, pack, model, GEN, state, rng, 4)
    state = admit(qparams, model, GEN, state, jnp.asarray(1), *req_b, rng)
    for _ in range(6):
        state, status = run_chunk(qparams, pack, model, GEN, state, rng, 4)
        s = np.asarray(status)
        if s[1].all():
            break
    s = np.asarray(status)
    assert s[1].all(), f"slots did not finish: {s}"

    codes = np.asarray(state.codes)
    for slot, ref in enumerate(refs):
        np.testing.assert_array_equal(codes[slot], np.asarray(ref.codes)[0])
        assert int(s[3, slot]) == int(ref.lengths[0])
        assert bool(s[2, slot]) == bool(ref.hit_limit[0])


def test_slot_reuse_after_harvest(setup):
    """A slot freed by a finished request can be re-admitted and reproduces
    an independent decode — stale cache/presence must not leak."""
    model, qparams, pack = setup
    max_new, bl = 12, 8
    p = CFG.condition_num_latent + 2 + bl + 2
    t_max = p + 1 + max_new
    t_max += (-t_max) % BLOCK_T

    req_a = _request(1, [3, 5, 7, 2, 9, 4])
    req_b = _request(2, [8, 1, 6])
    ref_b = decode(qparams, model, GEN, *req_b, jax.random.PRNGKey(0),
                   max_new, fused_pack=pack)

    state = init_state(CFG, 2, t_max, max_new, jnp.float32, False)
    rng = jax.random.PRNGKey(0)
    state = admit(qparams, model, GEN, state, jnp.asarray(0), *req_a, rng)
    for _ in range(7):
        state, status = run_chunk(qparams, pack, model, GEN, state, rng, 4)
        if np.asarray(status)[1, 0]:
            break
    assert np.asarray(status)[1, 0]
    # reuse slot 0 for request B
    state = admit(qparams, model, GEN, state, jnp.asarray(0), *req_b, rng)
    for _ in range(7):
        state, status = run_chunk(qparams, pack, model, GEN, state, rng, 4)
        if np.asarray(status)[1, 0]:
            break
    np.testing.assert_array_equal(np.asarray(state.codes)[0],
                                  np.asarray(ref_b.codes)[0])


def test_batcher_end_to_end_tiny_engine():
    """ContinuousBatcher drives the tiny engine end to end: staggered
    submissions all complete with decodable audio and metrics."""
    from voice_tts_tpu.config import TTSConfig
    from voice_tts_tpu.engine import TTSEngine
    from voice_tts_tpu.audio import encode_wav_int16

    cfg = TTSConfig.tiny()
    cfg.engine.use_int8_decode = True
    cfg.engine.use_fused_decode = True
    cfg.server.max_batch_size = 2
    engine = TTSEngine.random(cfg, seed=0)

    sr = cfg.engine.sample_rate
    t = np.arange(sr) / sr
    prompt = encode_wav_int16(
        (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.float32), sr)

    batcher = ContinuousBatcher(
        engine, chunk_steps=4,
        generation_kwargs={"do_sample": False, "num_beams": 1,
                           "max_mel_tokens": 16})
    pairs = [batcher.submit({"spk_audio_prompt": prompt, "text": txt})
             for txt in ("你好世界.", "今天天气很好.", "测试.")]
    batcher.run()
    for holder, ev in pairs:
        assert ev.is_set()
        res = holder[0]
        assert res.wav.dtype == np.int16 and len(res.wav) > 0
        assert res.metrics["audio_length"] > 0
        assert res.metrics["rtf"] > 0
