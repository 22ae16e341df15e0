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


def test_multi_replica_serving_watchdog_mesh():
    """Multi-replica serving sim on the virtual device mesh (VERDICT r4
    item 8): two engine replicas pinned to distinct devices serve a
    concurrent mixed workload through the real TTSService router; one
    replica is poisoned with a fatal device error mid-run and the watchdog
    rebuilds it IN PLACE (fresh params, same device) while the other
    replica keeps serving — routing, isolation, and continuity."""
    import asyncio

    from voice_tts_tpu.audio import encode_wav_int16
    from voice_tts_tpu.engine import TTSEngine
    from voice_tts_tpu.serving.app import TTSService

    devs = jax.devices()
    built = []

    def factory(i):
        eng = TTSEngine.tiny().to_device(devs[i])
        eng.cfg.server.max_batch_size = 2
        built.append(i)
        return eng

    service = TTSService()
    service._engine_factory = factory
    service.engines = [factory(0), factory(1)]

    sr = 16000
    t = np.arange(sr) / sr
    prompts = [
        encode_wav_int16((0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32),
                         sr)
        for f in (220.0, 330.0)
    ]

    # poison replica 1: its next batch dies with a fatal device error
    eng1 = service.engines[1]
    orig_infer_batch = eng1.infer_batch
    state = {"fail": 1}

    def flaky(reqs):
        if state["fail"]:
            state["fail"] -= 1
            raise RuntimeError("INTERNAL: simulated device failure on chip 1")
        return orig_infer_batch(reqs)

    eng1.infer_batch = flaky

    async def scenario():
        await service.start_workers()
        reqs = [service.submit({"spk_audio_prompt": prompts[i % 2],
                                "text": "你好"}) for i in range(8)]
        results = await asyncio.wait_for(
            asyncio.gather(*reqs, return_exceptions=True), timeout=1200)
        # round-robin routing: evens -> replica 0 (all succeed), odds ->
        # replica 1 (the poisoned first batch fails, the rest ride the
        # rebuilt replica).  Isolation: replica 0 sees none of the failures
        ok = [r for r in results if not isinstance(r, Exception)]
        fails = [r for r in results if isinstance(r, Exception)]
        assert len(fails) >= 1 and all("simulated device failure" in str(f)
                                       for f in fails)
        assert len(ok) >= 5
        assert all(len(r.wav) > 0 for r in ok)

        # continuity: after the rebuild BOTH replicas serve again (the
        # sampling RNG streams have diverged across replicas by now, so
        # assert service health rather than bit-identical audio)
        r0 = await asyncio.wait_for(service.submit(
            {"spk_audio_prompt": prompts[0], "text": "你好"}), timeout=1200)
        r1 = await asyncio.wait_for(service.submit(
            {"spk_audio_prompt": prompts[0], "text": "你好"}), timeout=1200)
        assert len(r0.wav) > 0 and np.isfinite(r0.wav).all()
        assert len(r1.wav) > 0 and np.isfinite(r1.wav).all()

    asyncio.run(scenario())

    # the watchdog rebuilt replica 1 once, on its own device
    assert built == [0, 1, 1]
    w1 = jax.tree.leaves(service.engines[1].params_gpt_rt)[0]
    assert w1.devices() == {devs[1]}
    assert service.metrics["tts_replica_rebuilds_total"] == 1
