"""End-to-end engine test on the tiny config with random weights."""

import numpy as np
import pytest

from voice_tts_tpu.audio import decode_audio_bytes, encode_wav_int16
from voice_tts_tpu.config import TTSConfig
from voice_tts_tpu.engine import TTSEngine


def _tiny_engine():
    return TTSEngine.tiny(seed=0)


@pytest.mark.ci_tier
def test_engine_end_to_end(tmp_path):
    engine = _tiny_engine()
    sr = 22050
    t = np.arange(int(0.6 * sr)) / sr
    tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    prompt = encode_wav_int16(tone * 32767, sr)

    out = tmp_path / "out.wav"
    res = engine.infer(prompt, "hello world.", str(out))
    assert res.sample_rate == 22050
    assert res.wav.ndim == 1 and len(res.wav) > 0
    assert np.isfinite(res.wav).all()
    assert res.metrics["rtf"] > 0
    for key in ("gpt_gen_time", "gpt_forward_time", "s2mel_time", "bigvgan_time"):
        assert key in res.metrics

    decoded, got_sr = decode_audio_bytes(out.read_bytes())
    assert got_sr == 22050 and len(decoded) == len(res.wav)

    # second call with the same prompt hits the conditioning cache
    res2 = engine.infer(prompt, "short.", None)
    assert len(engine._spk_cache) == 1
    assert len(res2.wav) > 0


def test_fused_pipeline_matches_split():
    """Whole-segment single-dispatch pipeline == split path, wav-exact
    (greedy decode, same rng; the code bucket math must agree end-to-end)."""
    import jax

    sr = 22050
    t = np.arange(int(0.6 * sr)) / sr
    prompt = encode_wav_int16(
        (0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)

    def run(fuse):
        eng = TTSEngine.tiny(seed=0)
        eng.cfg.engine.fuse_pipeline = fuse
        eng._rng = jax.random.PRNGKey(7)
        res = eng.infer(prompt, "hello.", None, do_sample=False)
        return res.wav

    w_split = run(False)
    w_fused = run(True)
    assert len(w_split) == len(w_fused)
    np.testing.assert_array_equal(w_fused, w_split)


def test_fused_pipeline_auto_bucket():
    """auto_code_bucket sizes the fused pipeline's code bucket from the text
    length (instead of max_mel_tokens).  With this seed the tiny greedy
    decode completes inside the estimated 32 bucket (no retry), which is
    also the bucket the split path picks from the actual code length — so
    the wav must be exact."""
    import jax

    sr = 22050
    t = np.arange(int(0.6 * sr)) / sr
    prompt = encode_wav_int16(
        (0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)

    def make(fuse):
        eng = TTSEngine.tiny(seed=0)
        # cap well above the tiny (32, 64) buckets' first rung so the
        # estimate actually picks a smaller bucket than the cap's
        eng.cfg.generation.max_mel_tokens = 64
        eng.cfg.engine.fuse_pipeline = fuse
        eng.cfg.engine.codes_per_text_token = 1.0
        eng._rng = jax.random.PRNGKey(7)
        return eng

    eng_f = make(True)
    calls = []
    orig = eng_f._segment_pipeline
    eng_f._segment_pipeline = lambda *a: calls.append(a[-3:]) or orig(*a)
    w_fused = eng_f.infer(prompt, "hello.", None, do_sample=False).wav
    assert calls == [(32, eng_f._mel_bucket_for(32), 32)]

    w_split = make(False).infer(prompt, "hello.", None, do_sample=False).wav
    np.testing.assert_array_equal(w_fused, w_split)

    # forced cap-hit: the host must retry ONCE at the full bucket (fake the
    # hit_limit metadata flag on the small-bucket dispatch only)
    eng_r = make(True)
    seen = []
    orig_r = eng_r._segment_pipeline

    def fake(*a):
        cbucket = a[-3]
        seen.append(cbucket)
        out = orig_r(*a)
        if cbucket < 64:
            out = np.array(out)  # writable copy
            out[0, -1, 2] = 1  # pretend the decode hit the estimated cap
        return out

    eng_r._segment_pipeline = fake
    w_retry = eng_r.infer(prompt, "hello.", None, do_sample=False).wav
    assert seen == [32, 64] and len(w_retry) > 0


@pytest.mark.ci_tier
def test_engine_emotion_controls():
    engine = _tiny_engine()
    sr = 22050
    t = np.arange(int(0.5 * sr)) / sr
    spk = encode_wav_int16((0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)
    emo = encode_wav_int16((0.3 * np.sin(2 * np.pi * 330 * t)) * 32767, sr)

    r1 = engine.infer(spk, "a.", None, emo_audio_prompt=emo, emo_alpha=0.5)
    assert len(r1.wav) > 0
    r2 = engine.infer(spk, "a.", None,
                      emo_vector=[0.6, 0, 0, 0, 0, 0, 0, 0.2])
    assert len(r2.wav) > 0


def test_engine_streaming_generator():
    engine = _tiny_engine()
    sr = 22050
    t = np.arange(int(0.5 * sr)) / sr
    prompt = encode_wav_int16((0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)
    chunks = list(engine.infer(prompt, "one. two.", None, stream_return=True,
                                max_text_tokens_per_segment=4))
    # 2 segments + 1 silence gap (order: seg, sil, seg)
    assert len(chunks) >= 2
    assert all(c.dtype == np.int16 for c in chunks)
    sil = [c for c in chunks if np.all(c == 0)]
    assert len(sil) >= 1


def test_quick_streaming_tokens_keeps_early_segments_small():
    """`infer_generator(quick_streaming_tokens=N)`: segments don't merge until
    the running token total exceeds N (reference `front.py:406-415`), so
    streaming yields more, smaller chunks early."""
    engine = _tiny_engine()
    # note the reference ALSO merges whenever the pair fits in max/2
    # (`front.py:418-419`), independent of quick_streaming_tokens — so the
    # knob only shows at segment sizes above max/2
    tokens = engine.tokenizer.tokenize("one. two. three.")
    merged = engine.tokenizer.split_segments(
        tokens, max_text_tokens_per_segment=8)
    quick = engine.tokenizer.split_segments(
        tokens, max_text_tokens_per_segment=8, quick_streaming_tokens=1000)
    assert len(quick) > len(merged)
    assert [t for seg in quick for t in seg] == \
           [t for seg in merged for t in seg]

    sr = 22050
    t = np.arange(int(0.5 * sr)) / sr
    prompt = encode_wav_int16((0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)
    chunks_quick = list(engine.infer_generator(
        prompt, "one. two. three.", max_text_tokens_per_segment=8,
        quick_streaming_tokens=1000))
    chunks_merged = list(engine.infer_generator(
        prompt, "one. two. three.", max_text_tokens_per_segment=8))
    assert len(chunks_quick) > len(chunks_merged)


def test_more_segment_before_plumbs_to_quick_streaming():
    """`infer(more_segment_before=N)` is the reference's name for the same
    knob (`infer_v2.py:442,449` forwards it positionally into
    `infer_generator`'s quick_streaming_tokens)."""
    engine = _tiny_engine()
    sr = 22050
    t = np.arange(int(0.5 * sr)) / sr
    prompt = encode_wav_int16((0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)
    res = engine.infer(prompt, "one. two. three.", None,
                       max_text_tokens_per_segment=8,
                       more_segment_before=1000)
    assert len(res.wav) > 0
    chunks = list(engine.infer(prompt, "one. two. three.", None,
                               stream_return=True,
                               max_text_tokens_per_segment=8,
                               more_segment_before=1000))
    assert len(chunks) > len(list(engine.infer(
        prompt, "one. two. three.", None, stream_return=True,
        max_text_tokens_per_segment=8)))


@pytest.mark.ci_tier
def test_typical_sampling_runs():
    import jax
    import jax.numpy as jnp
    from voice_tts_tpu.config import GenerationConfig
    from voice_tts_tpu.models.gpt.decode import apply_typical, sample_token

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(1, 50)).astype(np.float32) * 2)
    warped = np.asarray(apply_typical(logits, 0.5))
    kept = np.sum(warped > np.finfo(np.float32).min / 2)
    assert 1 <= kept < 50

    gen = GenerationConfig(do_sample=True, typical_sampling=True,
                           typical_mass=0.9, num_beams=1)
    tok = sample_token(logits, jnp.zeros((1, 50), bool), gen,
                       jax.random.PRNGKey(0))
    assert 0 <= int(tok[0]) < 50


def test_engine_beam_decode_path():
    engine = _tiny_engine()
    sr = 22050
    t = np.arange(int(0.5 * sr)) / sr
    prompt = encode_wav_int16((0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)
    res = engine.infer(prompt, "b.", None, num_beams=2, max_mel_tokens=16)
    assert len(res.wav) > 0 and np.isfinite(res.wav).all()


def test_infer_batches_own_segments():
    """Multi-segment `infer` routes through the infer_batch job machinery
    (engine.batch_segments, default on).  Greedy codes — and therefore the
    per-segment wav lengths — must match the sequential path; the samples
    themselves differ because the CFM draws its noise from differently-split
    rng keys on the two paths."""
    import jax

    sr = 22050
    t = np.arange(int(0.5 * sr)) / sr
    prompt = encode_wav_int16((0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)
    text = "one two. three four. five."

    def run(batched):
        eng = TTSEngine.tiny(seed=0)
        eng.cfg.engine.batch_segments = batched
        eng._rng = jax.random.PRNGKey(3)
        calls = {"decode": 0, "mel": 0}
        orig_d, orig_m = eng._decode_jobs, eng._mel_jobs

        def spy_d(*a, **k):
            calls["decode"] += 1
            return orig_d(*a, **k)

        def spy_m(*a, **k):
            calls["mel"] += 1
            return orig_m(*a, **k)

        eng._decode_jobs, eng._mel_jobs = spy_d, spy_m
        res = eng.infer(prompt, text, None, do_sample=False,
                        max_text_tokens_per_segment=4)
        return res, calls

    seq, seq_calls = run(False)
    bat, bat_calls = run(True)
    assert seq_calls == {"decode": 0, "mel": 0}  # sequential path
    # 3 segments, one text bucket, batch cap >= 3: one decode sub-batch
    assert bat_calls["decode"] >= 1
    assert np.isfinite(bat.wav).all()
    assert "synthesis_time" in bat.metrics and bat.metrics["gpt_gen_time"] > 0
    # greedy codes identical => identical per-segment frame counts => the
    # assembled wavs (with the same interval silences) have equal length
    assert len(bat.wav) == len(seq.wav)


def test_should_batch_segments_routing():
    """Cost-aware routing: with the batch-1 megakernel available but no
    batched megakernel, 2 equal segments decode faster sequentially
    (0.70*sum < 1.81*max); 3+ segments batch.  With the batched megakernel
    (or neither kernel), batching wins from 2 segments up."""
    eng = TTSEngine.tiny(seed=0)
    gen = eng._generation_config({})
    assert gen.num_beams == 1
    seg2 = [["a"] * 10, ["b"] * 10]
    seg3 = [["a"] * 10, ["b"] * 10, ["c"] * 10]

    eng.cfg.engine.batch_segments = True
    # no megakernel: XLA class both ways -> batch whenever max < sum
    eng.fused_pack = None
    assert eng._should_batch_segments(seg2, gen)
    # batch-1 megakernel only: sequential wins at 2 segments, loses at 3
    eng.fused_pack = object()
    eng.cfg.engine.use_fused_batch_decode = False
    assert not eng._should_batch_segments(seg2, gen)
    assert eng._should_batch_segments(seg3, gen)
    # batched megakernel: batch from 2 up
    eng.cfg.engine.use_fused_batch_decode = True
    assert eng._should_batch_segments(seg2, gen)
    # beams: same kernel class either way -> batch
    gen3 = eng._generation_config({"num_beams": 3})
    eng.cfg.engine.use_fused_batch_decode = False
    assert eng._should_batch_segments(seg2, gen3)
    # master switch off / single segment
    eng.cfg.engine.batch_segments = False
    assert not eng._should_batch_segments(seg3, gen)
    eng.cfg.engine.batch_segments = True
    assert not eng._should_batch_segments([["a"] * 5], gen)


def test_engine_infer_batch():
    engine = _tiny_engine()
    sr = 22050
    t = np.arange(int(0.5 * sr)) / sr
    p1 = encode_wav_int16((0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)
    p2 = encode_wav_int16((0.4 * np.sin(2 * np.pi * 330 * t)) * 32767, sr)
    reqs = [
        {"spk_audio_prompt": p1, "text": "first one."},
        {"spk_audio_prompt": p2, "text": "second piece of text."},
        {"spk_audio_prompt": p1, "text": "third."},
    ]
    results = engine.infer_batch(reqs)
    assert len(results) == 3
    for r in results:
        assert len(r.wav) > 0 and np.isfinite(r.wav).all()
        assert r.metrics["audio_length"] > 0
    # batch result for the shared prompt must match single-path determinism
    # in shape terms (same prompt cache reused)
    assert len(engine._spk_cache) == 2


def test_bf16_conditioning_close_to_f32():
    """`use_bf16_conditioning` (cold-prompt MXU-rate conditioning) stays
    within bf16 tolerance of the f32 conditioning outputs and runs e2e."""
    import numpy as np

    from voice_tts_tpu.audio import encode_wav_int16

    sr = 22050
    t = np.arange(int(0.5 * sr)) / sr
    prompt = encode_wav_int16((0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)

    e32 = _tiny_engine()
    c32 = e32._speaker_conditioning(prompt)
    e16 = TTSEngine.tiny(use_bf16_conditioning=True)
    c16 = e16._speaker_conditioning(prompt)
    for k in ("cond_latents", "spk_emovec", "style"):
        a = np.asarray(c32[k], np.float32)
        b = np.asarray(c16[k], np.float32)
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert rel < 0.05, (k, rel)

    res = e16.infer(prompt, "bf16 conditioning check.", None)
    assert len(res.wav) > 0


def test_batched_conditioning_matches_single():
    """`_speaker_conditioning_batch` (grouped serving's one-forward warm for
    NEW speakers) produces entries matching the per-request path row by row
    (the models are length-masked, so padded batching must not leak across
    rows), and `infer_batch` hits the warmed cache."""
    import jax.numpy as jnp

    sr = 22050
    t = np.arange(int(0.5 * sr)) / sr
    prompts = [encode_wav_int16(
        (0.4 * np.sin(2 * np.pi * f * t)) * 32767, sr)
        for f in (220.0, 277.0, 330.0)]

    e_single = _tiny_engine()
    singles = [e_single._speaker_conditioning(p) for p in prompts]

    e_batch = TTSEngine.tiny(seed=0)
    e_batch._speaker_conditioning_batch(prompts)  # 3 rows -> bucket 4
    assert len(e_batch._spk_cache) == 3
    for p, ref in zip(prompts, singles):
        got = e_batch._speaker_conditioning(p)  # cache hit
        for k in ("cond_latents", "spk_emovec", "style", "ref_mel",
                  "prompt_condition"):
            a = np.asarray(ref[k], np.float32)
            b = np.asarray(got[k], np.float32)
            assert a.shape == b.shape, k
            rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
            assert rel < 2e-3, (k, rel)
        assert got["mel_frames"] == ref["mel_frames"]
        assert int(got["w2v_len"][0]) == int(ref["w2v_len"][0])

    # infer_batch with all-new speakers goes through the batched warm
    reqs = [{"spk_audio_prompt": p, "text": "hi."} for p in prompts]
    e_fresh = TTSEngine.tiny(seed=0)
    out = e_fresh.infer_batch(reqs)
    assert len(out) == 3 and all(len(r.wav) > 0 for r in out)


@pytest.mark.ci_tier
def test_bf16_conditioning_with_bf16_gpt_tree():
    """use_bf16_conditioning + a bf16 runtime GPT tree (use_fp16/int8
    serving): the GPT conditioning convs require the input cast to the
    param dtype (the wave-C on-chip crash: conv_general_dilated f32 x
    bf16)."""
    from voice_tts_tpu.audio import encode_wav_int16

    e = TTSEngine.tiny(use_fp16=True, use_bf16_conditioning=True)
    sr = 22050
    t = np.arange(int(0.4 * sr)) / sr
    prompt = encode_wav_int16((0.4 * np.sin(2 * np.pi * 220 * t)) * 32767,
                              sr)
    c = e._speaker_conditioning(prompt)
    assert np.isfinite(np.asarray(c["cond_latents"], np.float32)).all()


def test_auto_code_bucket_decode_cap_and_retry():
    """`_decode_jobs`/`infer` size the decode cap from the text bucket
    (auto_code_bucket) and re-decode at the full max_mel_tokens cap when a
    row hits the estimate — output must equal the always-full-cap run
    (greedy, so the retry's RNG stream is irrelevant)."""
    from voice_tts_tpu.config import TTSConfig
    from voice_tts_tpu.engine import TTSEngine

    def build(auto):
        cfg = TTSConfig.tiny()
        cfg.generation.max_mel_tokens = 48     # full cap above bucket 32
        cfg.generation.do_sample = False
        cfg.generation.num_beams = 1
        cfg.engine.codes_per_text_token = 0.5  # tiny estimate -> cap 32
        cfg.engine.fuse_pipeline = False       # exercise the decode paths
        cfg.engine.auto_code_bucket = auto
        cfg.engine.max_prompt_seconds = 1.0
        return TTSEngine.random(cfg, seed=0)

    e_auto, e_full = build(True), build(False)
    assert e_auto._decode_cap(16, e_auto.cfg.generation) == 32
    sr = 22050
    t = np.arange(int(0.4 * sr)) / sr
    p1 = encode_wav_int16((0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)

    # single path (infer) — retry reuses the same key, so byte equality
    ra = e_auto.infer(p1, "cap retry.", None)
    rf = e_full.infer(p1, "cap retry.", None)
    np.testing.assert_array_equal(ra.wav, rf.wav)

    # batch path (_decode_jobs): compare the decoded CODES — the retry's
    # extra rng split shifts the downstream CFM noise stream, so wav bytes
    # legitimately differ across engines; greedy codes must not
    def decode_group(engine, texts):
        jobs = []
        for txt in texts:
            spk, emovec, segments = engine._prepare(
                p1, None, 1.0, None, False, None, False, txt, 120, 0)
            jobs.append({"tokens": segments[0], "spk": spk,
                         "emovec": emovec,
                         "ids": engine.tokenizer.convert_tokens_to_ids(
                             segments[0])})
        bucket = max(len(j["ids"]) for j in jobs)
        from voice_tts_tpu.engine import post
        bucket = post.pick_bucket(bucket, engine.cfg.engine.text_buckets)
        engine._decode_jobs(jobs, bucket, engine.cfg.generation)
        return [(j["codes"][:j["code_len"]]).tolist() for j in jobs]

    texts = ["one.", "two three."]
    assert decode_group(e_auto, texts) == decode_group(e_full, texts)

    # adaptive cap learning: a cap-hit observation raises the bucket's
    # floor to the full cap (the next group skips the doomed attempt)...
    gen = e_auto.cfg.generation
    e_auto._cap_hint.clear()
    e_auto._observe_code_len(16, [32], [True], 32, gen)
    assert e_auto._decode_cap(16, gen) == gen.max_mel_tokens
    # ...and decays back once shorter sequences dominate again
    for _ in range(40):
        e_auto._observe_code_len(16, [10], [False], 48, gen)
    assert e_auto._decode_cap(16, gen) == 32


def test_infer_batch_request_batched_beam_matches_sequential():
    """`infer_batch` at beam-3 with the megakernel packs request PAIRS into
    one 6-row kernel (`engine._beam_jobs_fused`).  Forcing
    `beam_batch_rows=3` (one request per kernel call) reproduces the old
    sequential path with the SAME per-job fold_in keys — so batched and
    sequential runs must emit bit-identical audio."""
    from voice_tts_tpu.config import TTSConfig
    from voice_tts_tpu.engine import TTSEngine

    cfg = TTSConfig.tiny()
    cfg.engine.use_int8_decode = True
    cfg.engine.use_fused_decode = True
    cfg.engine.use_fused_beam_decode = True
    cfg.generation.num_beams = 3
    cfg.generation.max_mel_tokens = 24
    cfg.engine.max_prompt_seconds = 1.0
    engine = TTSEngine.random(cfg, seed=0)
    assert engine.fused_pack is not None

    sr = 22050
    t = np.arange(int(0.4 * sr)) / sr
    p1 = encode_wav_int16((0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)
    reqs = [{"spk_audio_prompt": p1, "text": "one two."},
            {"spk_audio_prompt": p1, "text": "three."},
            {"spk_audio_prompt": p1, "text": "five six seven."}]

    rng0 = engine._rng
    engine.cfg.engine.beam_batch_rows = 8      # batched pairs (default)
    res_b = engine.infer_batch(reqs)
    engine._rng = rng0                          # same decode keys
    engine.cfg.engine.beam_batch_rows = 3      # r_cap=1 -> sequential
    res_s = engine.infer_batch(reqs)
    for rb, rs in zip(res_b, res_s):
        np.testing.assert_array_equal(rb.wav, rs.wav)

    # non-pow2 rows//K must not pad past the kernel's row cap: K=4 with
    # rows=12 gives r_cap 3, and padding a 3-request chunk to 4 would be
    # 16 rows (crashed before the pow-2 clamp) — now chunks of 2
    engine.cfg.engine.beam_batch_rows = 12
    engine.cfg.generation.num_beams = 4
    res4 = engine.infer_batch(reqs)
    assert all(len(r.wav) > 0 for r in res4)


def test_full_serving_profile_composition_e2e():
    """EVERY serving-profile flag at once on the tiny engine (int8 fused
    decode + folded readout + int8 KV + fused pipeline + bf16 conditioning
    + released master trees + fused beam at num_beams=3): the composition
    must build and synthesize — guards profile-flag interactions the
    per-flag tests cannot see."""
    from voice_tts_tpu.audio import encode_wav_int16
    from voice_tts_tpu.config import TTSConfig

    cfg = TTSConfig.tiny()
    cfg.apply_serving_profile()
    cfg.engine.max_prompt_seconds = 1.0
    cfg.generation.max_mel_tokens = 24
    # tiny-scale dim wiring (mirrors TTSEngine.tiny)
    cfg.w2v_bert.feature_projection_input_dim = 160
    cfg.gpt.condition_module.input_size = cfg.w2v_bert.hidden_size
    cfg.gpt.emo_condition_module.input_size = cfg.w2v_bert.hidden_size
    cfg.semantic_codec.hidden_size = cfg.w2v_bert.hidden_size
    cfg.s2mel.dit.content_dim = cfg.s2mel.length_regulator.channels
    cfg.s2mel.gpt_dim = cfg.gpt.model_dim
    cfg.s2mel.gpt_layer_out = cfg.w2v_bert.hidden_size
    cfg.s2mel.dit.in_channels = cfg.mel.num_mels
    cfg.s2mel.dit.style_dim = cfg.campplus.embedding_size
    cfg.s2mel.wavenet.hidden_dim = cfg.s2mel.dit.hidden_dim
    cfg.vocoder.num_mels = cfg.mel.num_mels

    engine = TTSEngine.random(cfg, seed=0)
    assert engine.fused_pack is not None
    assert engine.readout_pack is not None
    # master trees released to the runtime aliases
    assert engine.params["gpt"] is engine.params_gpt_rt
    assert engine.params["w2v"] is engine.params_cond_rt["w2v"]

    sr = 22050
    t = np.arange(int(0.4 * sr)) / sr
    prompt = encode_wav_int16((0.4 * np.sin(2 * np.pi * 220 * t)) * 32767,
                              sr)
    # beam-3 default (the reference config) through the full profile
    res = engine.infer(prompt, "profile composition.", None)
    assert len(res.wav) > 0 and np.isfinite(res.wav).all()
    # sampling path exercises the folded-readout fused pipeline
    res2 = engine.infer(prompt, "sampling too.", None, num_beams=1)
    assert len(res2.wav) > 0 and np.isfinite(res2.wav).all()
