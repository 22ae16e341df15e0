"""End-to-end benchmark: /tts-equivalent synthesis RTF on one chip.

Runs the full flagship-architecture pipeline (random weights — checkpoints
are external artifacts) on a 20-char Chinese utterance with a 5 s prompt:
prompt conditioning -> GPT AR decode -> s2mel CFM -> BigVGAN -> WAV, and
reports inference_time / audio_length (RTF, lower is better).

vs_baseline compares against the reference doc example RTF 0.14
(`/root/reference/README.md:216-223`) as speedup (>1 = faster than baseline).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_RTF = 0.14


def build_engine(tiny: bool):
    from voice_tts_tpu.config import TTSConfig
    from voice_tts_tpu.engine import TTSEngine

    if tiny:
        if os.environ.get("CONT_BATCH") == "1":
            # continuous batching needs the megakernel pack even on the
            # CPU smoke path (interpret-mode Pallas)
            cfg = TTSConfig.tiny()
            cfg.engine.use_int8_decode = True
            cfg.engine.use_fused_decode = True
            cfg.generation.num_beams = 1
            cfg.generation.max_mel_tokens = 24
            return TTSEngine.random(cfg, seed=0)
        return TTSEngine.tiny()

    cfg = TTSConfig()
    if os.environ.get("BENCH_LONG") == "1":
        # long-form mode: ~240-char text -> 2-3 segments of <=120 tokens,
        # ~1500 codes/segment (the reference max_mel_tokens cap).  Exercises
        # multi-segment batching (EngineConfig.batch_segments) and the
        # context lengths where the int8 KV cache pays (INT8_KV=1 A/B).
        cfg.generation.max_mel_tokens = 1536
        cfg.generation.num_beams = 1
        cfg.engine.text_buckets = (48, 128)
        cfg.engine.code_buckets = (256, 768, 1536)
        cfg.engine.batch_segments = (
            os.environ.get("BATCH_SEGMENTS", "1") == "1")
    else:
        # bench-scale generation: ~5 s of audio for a 20-char utterance
        cfg.generation.max_mel_tokens = 256
        cfg.generation.num_beams = 1
        cfg.engine.text_buckets = (48,)
        cfg.engine.code_buckets = (256,)
    cfg.engine.max_prompt_seconds = 15.0
    cfg.engine.use_fp16 = True  # bf16 GPT decode path
    # bounded-read Pallas decode attention: measured neutral at this
    # context length (see STATUS.md); enable for long-context configs
    # (PALLAS_ATTN=1 overrides for A/B runs)
    cfg.gpt.pallas_decode_attention = os.environ.get("PALLAS_ATTN") == "1"
    # int8 weight-only GPT decode (Pallas fused-dequant GEMV)
    cfg.engine.use_int8_decode = os.environ.get("INT8_DECODE", "1") == "1"
    # single-Pallas-call trunk megakernel for the batch-1 AR loop
    cfg.engine.use_fused_decode = os.environ.get("FUSED_DECODE", "1") == "1"
    # int4 (g128) megakernel tiles — bench default now OFF, matching the
    # engine default (round-3 quality gate, bench_results/r3/int4_quality:
    # teacher-forced logit KL 5.7e-3/step vs int8's 4.2e-5 — 135x — with
    # greedy top-1 agreement indistinguishable from noise at random
    # weights; per VERDICT r2 item 5 the unvalidated scheme no longer
    # drives the headline.  A/B on: INT4_DECODE=1)
    cfg.engine.use_int4_decode = os.environ.get("INT4_DECODE", "0") == "1"
    # self-speculative decode A/B (SPEC_DECODE=4: int4 drafts + one int8
    # verify pass per 4 tokens; output distribution exactly the int8 path)
    if os.environ.get("SPEC_DECODE"):
        cfg.engine.spec_decode_k = int(os.environ["SPEC_DECODE"])
    # int4 scale-group width A/B (INT4_GROUP=640 at D=1280: G=2, dense
    # full-rate K=640 sub-dots instead of 20 half-rate K=64 ones)
    if os.environ.get("INT4_GROUP"):
        cfg.engine.int4_group = int(os.environ["INT4_GROUP"])
    # int4 dequant scheme A/B (INT4_EXPAND=1: whole-tile MXU dequant;
    # measured LOSS at bench shape: 0.0843.  INT4_SCHEME=i8sh: int8-lane
    # shift unpack, identical numerics to the default mask unpack)
    cfg.engine.int4_expand = os.environ.get("INT4_EXPAND", "0") == "1"
    sch = os.environ.get("INT4_SCHEME")
    if sch:
        if sch not in ("group", "expand", "i8sh"):
            raise ValueError(f"INT4_SCHEME must be group/expand/i8sh, "
                             f"got {sch!r}")
        cfg.engine.int4_expand = {"group": False, "expand": True}.get(sch, sch)
    # megakernel grid A/B (MERGE_STAGES=3 or 6 weight tiles per grid step);
    # unset -> keep the engine-wide default (3, the measured winner)
    ms = os.environ.get("MERGE_STAGES")
    if ms is not None:
        cfg.engine.merge_decode_stages = 3 if ms == "1" else int(ms)
    # int8 KV cache in the megakernel (per-position scales)
    cfg.engine.use_int8_kv = os.environ.get("INT8_KV", "0") == "1"
    # batched decode-step megakernel for continuous-batch serving
    # (bench_serving.py A/B: FUSED_BATCH=1)
    cfg.engine.use_fused_batch_decode = (
        os.environ.get("FUSED_BATCH", "0") == "1")
    # beam decode through the batched megakernel (reference default is
    # num_beams=3; bench runs beams=1, so pair FUSED_BEAM=1 with BEAMS=3)
    cfg.engine.use_fused_beam_decode = (
        os.environ.get("FUSED_BEAM", "0") == "1")
    if os.environ.get("BEAMS"):
        cfg.generation.num_beams = int(os.environ["BEAMS"])
    # request-batched beam A/B (BEAM_BATCH_ROWS=3: one request per kernel
    # call, the round-4 sequential behavior; 6/12: 2/4 requests x 3 beams)
    if os.environ.get("BEAM_BATCH_ROWS"):
        cfg.engine.beam_batch_rows = int(os.environ["BEAM_BATCH_ROWS"])
    # folded megakernel readout (int8 mel_head tiles streamed through the
    # decode kernel's weight pipeline) — round-4 default ON, matching the
    # serving profile (r4 A/B: 0.0716 -> 0.0705; logit-KL bound in the
    # quality gate's int8_rofold row).  A/B off: FOLD_READOUT=0
    cfg.engine.fold_readout = os.environ.get("FOLD_READOUT", "1") == "1"
    # bf16 conditioning encoders A/B (COND_BF16=1): the cold-prompt
    # w2v-bert(17)+RepCodec+CAMPPlus forward at MXU rate
    cfg.engine.use_bf16_conditioning = (
        os.environ.get("COND_BF16", "0") == "1")
    # CFM Euler-scan unroll A/B (CFM_UNROLL=5: 5 steps per compiled loop
    # body, exact numerics)
    if os.environ.get("CFM_UNROLL"):
        cfg.engine.cfm_unroll = int(os.environ["CFM_UNROLL"])
    # bf16 s2mel/DiT compute (f32 softmax/LN stats); measured perf-neutral
    # at bench shapes (DiT is op-overhead-bound, not MXU-bound) — default off
    # to keep the reference's fp32 s2mel numerics
    cfg.engine.use_bf16_s2mel = os.environ.get("S2MEL_BF16", "0") == "1"
    # whole-segment single-dispatch pipeline; max_mel_tokens above is sized
    # to the utterance, which is exactly the case it is designed for
    cfg.engine.fuse_pipeline = os.environ.get("FUSE_PIPELINE", "1") == "1"
    # shared-activation vocoder: one AA call per dilation iteration across
    # the 3 resblocks (exact math; A/B via SHARED_ACT_VOC=0/1)
    cfg.engine.use_shared_act_vocoder = (
        os.environ.get("SHARED_ACT_VOC", "0") == "1")
    # fused resblock-stage Pallas kernels for the late vocoder stages
    cfg.engine.use_fused_vocoder = os.environ.get("FUSED_VOC", "0") == "1"
    return TTSEngine.random(cfg, seed=0)


def wait_for_backend(deadline_s: float = 480.0) -> bool:
    """Absorb transient axon-tunnel outages before the real run.

    A failed axon claim leaves non-daemon threads behind, so each probe runs
    in a subprocess (os._exit there).  Probes retry until the deadline; if
    none succeeds we still attempt the real run once — this only buys time,
    it never gives up on behalf of the caller.
    """
    import subprocess

    probe = ("import os\n"
             "try:\n"
             "    import jax\n"
             "    jax.devices()\n"
             "except Exception:\n"
             "    os._exit(1)\n"
             "os._exit(0)\n")
    t0 = time.time()
    while True:
        remaining = deadline_s - (time.time() - t0)
        if remaining <= 0:
            return False
        try:
            rc = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=min(remaining, 240.0),
            ).returncode
        except subprocess.TimeoutExpired:
            # hung backend init: a retry loop won't outwait this mode
            return False
        if rc == 0:
            return True
        print(f"bench: TPU backend unavailable, retrying "
              f"({deadline_s - (time.time() - t0):.0f}s left)",
              file=sys.stderr)
        time.sleep(min(60.0, max(0.0, deadline_s - (time.time() - t0))))


def _unique_prompt(i: int) -> bytes:
    """A 5 s prompt whose CONTENT differs per i (distinct conditioning-cache
    key), modelling a new speaker per request."""
    from voice_tts_tpu.audio import encode_wav_int16

    sr = 22050
    t = np.arange(5 * sr) / sr
    rng = np.random.default_rng(1000 + i)
    f0 = float(rng.uniform(140, 340))
    tone = (0.4 * np.sin(2 * np.pi * f0 * t)
            + 0.08 * np.sin(2 * np.pi * 2.1 * f0 * t)
            + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
    return encode_wav_int16(tone * 32767, sr)


def run_cold(engine, args, text_warm, text_bench):
    """Cold-prompt metric (VERDICT r3 item 2a): every request brings a NEW
    speaker, so the w2v-bert(17)+RepCodec+CAMPPlus+mel+regulator conditioning
    pipeline runs at the 15 s static shape on each call (cache miss) —
    the fleet-realistic case the warm bench hides.  Reference behavior:
    the per-request conditioning the reference recomputes unless the caller
    reuses a prompt (`infer_v2.py:507-550`)."""
    import jax

    # compile everything once (conditioning graph + decode/synthesis buckets)
    for _ in range(1 if args.tiny else 4):
        engine.infer(_unique_prompt(0), text_warm, None)

    rtfs, preps, metrics = [], [], None
    for r in range(args.repeats):
        res = engine.infer(_unique_prompt(1 + r), text_bench, None)
        rtfs.append(res.metrics["rtf"])
        preps.append(res.metrics["prepare_time"])
        metrics = dict(res.metrics)
    # warm-reference point: same prompt again (cache hit)
    res_warm = engine.infer(_unique_prompt(args.repeats), text_bench, None)
    res_warm = engine.infer(_unique_prompt(args.repeats), text_bench, None)
    rtf = float(np.median(rtfs))
    metrics["prepare_time"] = float(np.median(preps))
    metrics["warm_rtf"] = res_warm.metrics["rtf"]
    metrics["warm_prepare_time"] = res_warm.metrics["prepare_time"]
    return {
        "metric": "e2e_rtf_20char_zh_coldprompt",
        "value": round(rtf, 5),
        "unit": "rtf",
        "vs_baseline": round(BASELINE_RTF / rtf, 3) if rtf > 0 else 0.0,
    }, metrics


def run_ttfa(engine, args, text_warm):
    """Streaming time-to-first-audio (VERDICT r3 item 2b): `infer_generator`
    (the `stream_return=True` path, reference `infer_v2.py:442-467`) on a
    multi-segment text; TTFA = wall time until the FIRST segment's wav is on
    the host.  QUICK_TOKENS=N A/Bs `quick_streaming_tokens` (the reference's
    first-chunk shortener)."""
    qt = int(os.environ.get("QUICK_TOKENS", "0"))
    # ~6 sentences -> >=2 segments at max_text_tokens_per_segment=120
    text = text_warm * 6
    kwargs = dict(quick_streaming_tokens=qt) if qt else {}

    def once():
        t0 = time.perf_counter()
        gen = engine.infer_generator(_unique_prompt(0), text, **kwargs)
        first = next(gen)
        ttfa = time.perf_counter() - t0
        n = len(first)
        for seg in gen:   # drain (total wall for context)
            n += len(seg)
        total = time.perf_counter() - t0
        return ttfa, total, n

    for _ in range(1 if args.tiny else 3):
        once()
    ttfas, totals, frames = [], [], 0
    for _ in range(args.repeats):
        ttfa, total, n = once()
        ttfas.append(ttfa)
        totals.append(total)
        frames = n
    sr = engine.cfg.engine.sample_rate
    ttfa = float(np.median(ttfas))
    detail = {
        "total_s": round(float(np.median(totals)), 4),
        "audio_s": round(frames / sr, 3),
        "quick_streaming_tokens": qt,
    }
    return {
        "metric": "stream_ttfa_s",
        "value": round(ttfa, 4),
        "unit": "s",
        "vs_baseline": 0.0,
    }, detail


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true",
                        help="tiny config (CPU smoke test)")
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--mode", choices=["rtf", "cold", "ttfa"],
                        default="rtf",
                        help="rtf: warm single-request RTF (the driver's "
                             "headline); cold: new-speaker-per-request "
                             "conditioning cost; ttfa: streaming "
                             "time-to-first-audio")
    args = parser.parse_args()

    if not args.tiny:
        wait_for_backend()

    try:
        import jax
        if args.tiny:
            jax.config.update("jax_platforms", "cpu")
        # persistent compile cache: stage graphs survive across processes
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

        from voice_tts_tpu.audio import encode_wav_int16

        engine = build_engine(args.tiny)

        sr = 22050
        t = np.arange(5 * sr) / sr
        tone = (0.4 * np.sin(2 * np.pi * 220 * t)
                + 0.1 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        prompt = encode_wav_int16(tone * 32767, sr)

        text_warm = "欢迎大家来体验这个语音合成系统谢谢大家."
        text_bench = "今天天气真好我们一起出去散步聊天吧."
        assert len(text_warm.rstrip(".")) >= 18 and len(text_bench.rstrip(".")) >= 17
        metric_name = "e2e_rtf_20char_zh"
        if not args.tiny and os.environ.get("BENCH_LONG") == "1":
            # ~12 sentences, ~240 chars -> 2-3 <=120-token segments
            sentences = [text_warm, text_bench] * 6
            text_bench = "".join(sentences)
            text_warm = text_bench
            metric_name = "e2e_rtf_240char_zh"

        if args.mode == "cold":
            result, detail = run_cold(engine, args, text_warm, text_bench)
            print(json.dumps(result))
            print(json.dumps({"detail": {k: round(v, 4) for k, v in
                                         detail.items()},
                              "backend": jax.default_backend()}),
                  file=sys.stderr)
            return
        if args.mode == "ttfa":
            result, detail = run_ttfa(engine, args, text_warm)
            print(json.dumps(result))
            print(json.dumps({"detail": detail,
                              "backend": jax.default_backend()}),
                  file=sys.stderr)
            return

        # warm-up: compiles every stage graph for the buckets.  On the
        # axon tunnel the first ~6 executions after a compile run well
        # below steady-state speed, so warm several times before timing.
        warmups = 1 if args.tiny else 4
        for _ in range(warmups):
            engine.infer(prompt, text_warm, None)

        rtfs, metrics = [], None
        for _ in range(args.repeats):
            res = engine.infer(prompt, text_bench, None)
            rtfs.append(res.metrics["rtf"])
            metrics = res.metrics
        rtf = float(np.median(rtfs))

        result = {
            "metric": metric_name,
            "value": round(rtf, 5),
            "unit": "rtf",
            "vs_baseline": round(BASELINE_RTF / rtf, 3) if rtf > 0 else 0.0,
        }
        print(json.dumps(result))
        print(json.dumps({"detail": {k: round(v, 4) for k, v in metrics.items()},
                          "backend": jax.default_backend()}), file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — always emit the JSON line
        print(json.dumps({"metric": "e2e_rtf_20char_zh", "value": -1.0,
                          "unit": "rtf", "vs_baseline": 0.0,
                          "error": f"{type(e).__name__}: {e}"[:300]}))
        raise


if __name__ == "__main__":
    main()
