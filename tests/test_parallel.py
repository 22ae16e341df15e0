"""Multi-chip paths: TP-sharded inference and the driver's multichip dryrun.

Runs on the 8-device CPU mesh from conftest (SURVEY §2.5: the reference has
no live model parallelism — its HF `parallelize()` layer split is dead code
at `indextts/gpt/model_v2.py:61-77`; here TP is real `jax.sharding` over a
Mesh with XLA-inserted collectives).
"""

import numpy as np

import jax
import jax.numpy as jnp

from voice_tts_tpu.config import ConformerConfig, GPTConfig, GenerationConfig
from voice_tts_tpu.models.gpt import UnifiedVoice
from voice_tts_tpu.models.gpt.decode import decode
from voice_tts_tpu.parallel import make_mesh, shard_params

TINY = GPTConfig(
    layers=2, model_dim=64, heads=4, max_text_tokens=32, max_mel_tokens=48,
    number_text_tokens=40, number_mel_codes=68, start_mel_token=66,
    stop_mel_token=67, condition_num_latent=4, emo_dim=1024,
    condition_module=ConformerConfig(
        input_size=24, output_size=32, attention_heads=2, linear_units=48,
        num_blocks=2, input_layer="conv2d2", perceiver_mult=2),
    emo_condition_module=ConformerConfig(
        input_size=24, output_size=32, attention_heads=2, linear_units=48,
        num_blocks=1, input_layer="conv2d2", perceiver_mult=2),
)


def _init(model, text):
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 1024)),
                      jnp.zeros((1, 6, 1024)), jnp.asarray(text),
                      jnp.asarray([text.shape[1]]),
                      jnp.zeros((1, 5), dtype=jnp.int32),
                      jnp.asarray([5]), method=UnifiedVoice.init_all)


def test_tp_sharded_decode_matches_single_device():
    """Greedy AR decode with megatron-style TP-sharded parameters over a
    4-way "tp" mesh must produce exactly the single-device codes (XLA
    inserts the all-reduces; the KV cache shards over heads by
    propagation)."""
    model = UnifiedVoice(TINY)
    rng = np.random.default_rng(5)
    text = rng.integers(2, 30, size=(1, 7)).astype(np.int32)
    params = _init(model, text)
    cond = jnp.asarray(rng.normal(size=(1, 4, TINY.model_dim)) * 0.1
                       ).astype(jnp.float32)
    emovec = jnp.asarray(rng.normal(size=(1, TINY.model_dim)) * 0.1
                         ).astype(jnp.float32)
    lens = jnp.asarray([7], dtype=jnp.int32)
    gen = GenerationConfig(do_sample=False, repetition_penalty=1.0,
                           num_beams=1)

    ref = decode(params, model, gen, cond, emovec, jnp.asarray(text), lens,
                 jax.random.PRNGKey(1), max_new=8)

    mesh = make_mesh(("tp",), devices=jax.devices()[:4])
    with mesh:
        sharded = shard_params(params, mesh)
        # at least the GPT trunk matmuls must actually shard
        qkv = sharded["params"]["gpt"]["h_0"]["attn_c_attn"]["weight"]
        assert not qkv.sharding.is_fully_replicated
        out = decode(sharded, model, gen, cond, emovec, jnp.asarray(text),
                     lens, jax.random.PRNGKey(1), max_new=8)

    np.testing.assert_array_equal(np.asarray(out.codes), np.asarray(ref.codes))
    np.testing.assert_array_equal(np.asarray(out.lengths),
                                  np.asarray(ref.lengths))


def test_engine_tensor_parallel_matches_single():
    """TTSEngine with engine.tensor_parallel=4: same waveform as the
    single-device engine (greedy path is deterministic; TP math is exact
    modulo reduction order, which greedy tokens and the int16 quantizer
    absorb)."""
    from voice_tts_tpu.engine import TTSEngine
    from voice_tts_tpu.audio import encode_wav_int16

    sr = 16000
    t = np.arange(sr) / sr
    prompt = encode_wav_int16(
        (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), sr)

    eng_tp = TTSEngine.tiny(tensor_parallel=4, use_fused_decode=False,
                            use_int8_decode=False)
    assert eng_tp._tp_mesh is not None
    qkv = eng_tp.params_gpt_rt["params"]["gpt"]["h_0"]["attn_c_attn"]["weight"]
    assert not qkv.sharding.is_fully_replicated
    res_tp = eng_tp.infer(prompt, "你好世界")

    eng = TTSEngine.tiny(use_fused_decode=False, use_int8_decode=False)
    res = eng.infer(prompt, "你好世界")
    assert res_tp.wav.shape == res.wav.shape
    diff = np.abs(res_tp.wav.astype(np.int32) - res.wav.astype(np.int32))
    assert diff.max() <= 2, diff.max()


def test_engine_replica_device_pinning():
    """`TTSEngine.to_device` commits a replica's parameters to its chip and
    inference runs there (serving DP: one replica per device)."""
    from voice_tts_tpu.engine import TTSEngine
    from voice_tts_tpu.audio import encode_wav_int16

    sr = 16000
    t = np.arange(sr) / sr
    prompt = encode_wav_int16(
        (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), sr)

    devs = jax.devices()
    eng0 = TTSEngine.tiny().to_device(devs[0])
    eng1 = TTSEngine.tiny().to_device(devs[1])
    w0 = jax.tree.leaves(eng0.params_gpt_rt)[0]
    w1 = jax.tree.leaves(eng1.params_gpt_rt)[0]
    assert w0.devices() == {devs[0]} and w1.devices() == {devs[1]}

    r0 = eng0.infer(prompt, "你好")
    r1 = eng1.infer(prompt, "你好")
    # same seed + same input on identical replicas -> identical audio,
    # computed on different devices
    np.testing.assert_array_equal(r0.wav, r1.wav)


def test_dryrun_multichip_entrypoint():
    """The driver's dp x tp training dryrun compiles and executes on the
    8-device CPU mesh (same call the round harness makes)."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
