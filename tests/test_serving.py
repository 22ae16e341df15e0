"""HTTP serving layer: schema, endpoints, error taxonomy."""

import asyncio
import http.client
import json
import threading
import time

import numpy as np
import pytest

from voice_tts_tpu.audio import encode_wav_int16


@pytest.fixture(scope="module")
def server():
    from voice_tts_tpu.serving.app import TTSService
    from tests.test_engine import _tiny_engine

    service = TTSService()
    service.engines.append(_tiny_engine())

    loop = asyncio.new_event_loop()
    port = 18021
    ready = threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def main():
            await service.start_workers()
            srv = await asyncio.start_server(service.server._handle,
                                             "127.0.0.1", port)
            ready.set()
            async with srv:
                await srv.serve_forever()

        try:
            loop.run_until_complete(main())
        except Exception:
            pass

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert ready.wait(10)
    yield port
    loop.call_soon_threadsafe(loop.stop)


def _request(port, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    payload = json.dumps(body) if body is not None else None
    conn.request(method, path, body=payload,
                 headers={"Content-Type": "application/json"} if payload else {})
    resp = conn.getresponse()
    data = json.loads(resp.read().decode())
    conn.close()
    return resp.status, data


def _hex_prompt():
    sr = 22050
    t = np.arange(int(0.5 * sr)) / sr
    tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    return encode_wav_int16(tone * 32767, sr).hex()


@pytest.mark.ci_tier
def test_root_and_health(server):
    status, data = _request(server, "GET", "/")
    assert status == 200 and data["model_loaded"] is True
    status, data = _request(server, "GET", "/health")
    assert status == 200 and data["status"] == "healthy"
    status, data = _request(server, "GET", "/debug/worker-info")
    assert status == 200 and data["model_info"]["loaded"] is True
    assert len(data["replicas"]) == data["model_info"]["replicas"]
    assert {"replica", "device", "tensor_parallel",
            "engine_flags", "num_beams"} <= set(data["replicas"][0])
    flags = data["replicas"][0]["engine_flags"]
    assert {"use_int8_decode", "use_fused_decode", "use_fused_batch_decode",
            "use_fused_beam_decode", "use_int8_kv",
            "fuse_pipeline"} <= set(flags)


@pytest.mark.ci_tier
def test_tts_roundtrip(server):
    status, data = _request(server, "POST", "/tts", {
        "text": "hi there.", "spk_audio": _hex_prompt()})
    assert status == 200, data
    for field in ("audio_hex", "audio_length", "inference_time", "rtf", "text"):
        assert field in data
    wav = bytes.fromhex(data["audio_hex"])
    assert wav[:4] == b"RIFF"
    assert data["audio_length"] > 0


@pytest.mark.ci_tier
def test_tts_with_emotion_label(server):
    status, data = _request(server, "POST", "/tts", {
        "text": "hello.", "spk_audio": _hex_prompt(),
        "emotion": "happy", "emo_alpha": 0.7})
    assert status == 200, data


@pytest.mark.ci_tier
def test_error_taxonomy(server):
    # bad audio input format -> 400
    status, data = _request(server, "POST", "/tts", {
        "text": "x.", "spk_audio": "definitely-not-audio"})
    assert status == 400
    # invalid emo_alpha -> 422 (validation)
    status, data = _request(server, "POST", "/tts", {
        "text": "x.", "spk_audio": _hex_prompt(), "emo_alpha": 3.0})
    assert status == 422
    # invalid json -> 400
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=30)
    conn.request("POST", "/tts", body="{not json", headers={})
    resp = conn.getresponse()
    assert resp.status == 400
    resp.read()
    conn.close()
    # unknown route -> 404
    status, _ = _request(server, "GET", "/nope")
    assert status == 404
    # wrong method -> 405
    status, _ = _request(server, "GET", "/tts")
    assert status == 405


@pytest.mark.ci_tier
def test_metrics_endpoint(server):
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=30)
    conn.request("GET", "/metrics")
    resp = conn.getresponse()
    body = resp.read().decode()
    conn.close()
    assert resp.status == 200
    assert "tts_requests_total" in body
    assert "tts_queue_depth" in body


def test_replica_watchdog_rebuilds_wedged_engine():
    """A replica wedged by a fatal device error is rebuilt from the engine
    factory mid-queue and service continues (VERDICT r1 item 10 — the
    in-process analogue of gunicorn worker recycling,
    reference `gunicorn_config.py:19-22,63-70`)."""
    from voice_tts_tpu.serving.app import TTSService
    from tests.test_engine import _tiny_engine

    good = _tiny_engine()
    service = TTSService()
    rebuilt = []

    def factory(i):
        rebuilt.append(i)
        return good

    service._engine_factory = factory

    class Wedged:
        cfg = good.cfg

        def infer_batch(self, reqs):
            raise RuntimeError("simulated device failure: HBM RESOURCE_EXHAUSTED")

    service.engines.append(Wedged())

    sr = 22050
    t = np.arange(int(0.5 * sr)) / sr
    prompt = encode_wav_int16((0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)
    req = {"spk_audio_prompt": prompt, "text": "hi."}

    async def scenario():
        await service.start_workers()
        # the poisoned replica fails the in-flight request...
        with pytest.raises(RuntimeError):
            await service.submit(dict(req), timeout=300)
        # ...and the watchdog rebuilds it; queued work then succeeds
        res = await asyncio.wait_for(service.submit(dict(req)), timeout=300)
        assert len(res.wav) > 0

    asyncio.run(scenario())
    assert rebuilt == [0]
    assert service.engines[0] is good
    assert service.metrics["tts_replica_rebuilds_total"] == 1


def test_consecutive_failures_trigger_rebuild():
    """Non-fatal errors don't rebuild immediately, but a replica that keeps
    failing crosses max_consecutive_failures and gets recycled."""
    from voice_tts_tpu.serving.app import TTSService
    from tests.test_engine import _tiny_engine

    good = _tiny_engine()
    good.cfg.server.max_consecutive_failures = 2
    service = TTSService()
    rebuilt = []

    def factory(i):
        rebuilt.append(i)
        return good

    service._engine_factory = factory

    class Flaky:
        cfg = good.cfg

        def infer_batch(self, reqs):
            raise KeyError("mundane per-request bug")  # not fatal by itself

    service.engines.append(Flaky())

    sr = 22050
    t = np.arange(int(0.4 * sr)) / sr
    prompt = encode_wav_int16((0.4 * np.sin(2 * np.pi * 330 * t)) * 32767, sr)
    req = {"spk_audio_prompt": prompt, "text": "yo."}

    async def scenario():
        await service.start_workers()
        with pytest.raises(KeyError):
            await service.submit(dict(req), timeout=300)
        assert rebuilt == []  # one mundane failure: no recycle yet
        with pytest.raises(KeyError):
            await service.submit(dict(req), timeout=300)
        res = await asyncio.wait_for(service.submit(dict(req)), timeout=300)
        assert len(res.wav) > 0

    asyncio.run(scenario())
    assert rebuilt == [0]


def test_drain_waits_for_queued_work():
    """`TTSService.drain` returns True once queues empty (the graceful
    shutdown path) and False when the budget is exceeded."""
    from voice_tts_tpu.serving.app import TTSService
    from tests.test_engine import _tiny_engine

    service = TTSService()
    engine = _tiny_engine()
    service.engines.append(engine)

    sr = 22050
    t = np.arange(int(0.4 * sr)) / sr
    prompt = encode_wav_int16((0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)

    async def scenario():
        await service.start_workers()
        fut = asyncio.ensure_future(
            service.submit({"spk_audio_prompt": prompt, "text": "hi."}))
        assert await service.drain(graceful_timeout=120.0)
        res = await fut
        assert len(res.wav) > 0
        # an empty service drains instantly
        assert await service.drain(graceful_timeout=0.5)

    asyncio.run(scenario())


@pytest.mark.ci_tier
def test_serving_profile_enables_measured_winners():
    """The production profile must enable every committed-winner fast path
    (the round-3 verdict found `serving/app.py --model-dir` served the
    slowest measured config because the flags only lived in bench env
    vars)."""
    from voice_tts_tpu.config import TTSConfig

    cfg = TTSConfig.serving()
    e = cfg.engine
    assert e.use_fp16 and e.use_int8_decode and e.use_fused_decode
    assert e.use_fused_batch_decode and e.use_fused_beam_decode
    assert e.use_int8_kv and e.fuse_pipeline
    assert e.merge_decode_stages == 3
    # quality gate: int4 stays opt-in until real-checkpoint validation
    assert not e.use_int4_decode and e.spec_decode_k == 0
    # the reference default generation config is untouched
    assert cfg.generation.num_beams == 3

    # apply_serving_profile layers onto an existing (artifact) config
    cfg2 = TTSConfig.tiny()
    cfg2.apply_serving_profile()
    assert cfg2.engine.use_fused_decode and cfg2.gpt.layers == 2


@pytest.mark.ci_tier
def test_from_artifacts_profile(tmp_path):
    """`from_artifacts(profile='serving')` layers the fast-path flags onto
    the saved config; 'stock' keeps it as saved; unknown names raise."""
    from voice_tts_tpu.engine import TTSEngine
    from voice_tts_tpu.utils.artifacts import save_artifacts
    from tests.test_engine import _tiny_engine

    engine = _tiny_engine()
    out = tmp_path / "artifacts"
    save_artifacts(str(out), engine.cfg, engine.params,
                   {"w2v_mean": np.asarray(engine.w2v_mean),
                    "w2v_std": np.asarray(engine.w2v_std)})

    stock = TTSEngine.from_artifacts(str(out), profile="stock")
    assert not stock.cfg.engine.use_fused_batch_decode

    served = TTSEngine.from_artifacts(str(out), profile="serving")
    assert served.cfg.engine.use_fused_batch_decode
    assert served.cfg.engine.use_int8_decode
    assert served.fused_pack is not None

    with pytest.raises(ValueError, match="unknown profile"):
        TTSEngine.from_artifacts(str(out), profile="turbo")


def test_boot_warmup_covers_workload_buckets():
    """`TTSService._warmup` in "workload" mode compiles every decode graph
    the configured workload can touch BEFORE /health goes ready: after
    warmup, requests landing in any warmed (text bucket, batch bucket)
    pay ZERO new decode/beam-graph compiles (jit cache sizes frozen) —
    the round-4 c16 burst 504'd precisely because batch graphs compiled
    mid-traffic."""
    import numpy as np

    from voice_tts_tpu.audio import encode_wav_int16
    from voice_tts_tpu.models.gpt import beam as beam_mod
    from voice_tts_tpu.models.gpt import decode as decode_mod
    from voice_tts_tpu.serving.app import TTSService

    svc = TTSService()
    svc.load_engines(None, 1, tiny=True)       # tiny skips auto-warmup
    engine = svc.engines[0]
    engine.cfg.server.warmup_mode = "workload"
    engine.cfg.server.max_batch_size = 2
    texts = svc._warm_texts(engine)
    assert texts, "warm texts must cover at least one bucket"
    svc._warmup()

    fns = [decode_mod.decode, beam_mod.beam_decode,
           beam_mod.beam_decode_batch, beam_mod.beam_decode_fused_batch]
    sizes = [f._cache_size() for f in fns]

    # a NEW speaker (different tone, same prompt shape) in warmed buckets:
    # conditioning/decode/synthesis graphs must all be cache hits
    sr = 16000
    t = np.arange(2 * sr) / sr
    wav = encode_wav_int16((0.3 * np.sin(2 * np.pi * 330 * t))
                           .astype(np.float32), sr)
    engine.infer(wav, texts[0])
    engine.infer_batch([{"spk_audio_prompt": wav, "text": texts[-1]}] * 2)
    assert [f._cache_size() for f in fns] == sizes, (
        "request after warmup compiled a new decode graph")
