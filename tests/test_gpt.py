"""UnifiedVoice GPT stack: parity vs reference torch model + decode loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voice_tts_tpu.config import ConformerConfig, GPTConfig, GenerationConfig
from voice_tts_tpu.models.gpt import UnifiedVoice
from voice_tts_tpu.models.gpt.decode import decode
from voice_tts_tpu.utils.checkpoint import convert_unified_voice

from tests.reference_oracle import install_reference_gpt, reference_available

needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference repo not mounted")

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


def _build_reference(cfg: GPTConfig):
    import torch
    from indextts.gpt.model_v2 import UnifiedVoice as RefUV

    torch.manual_seed(0)
    cm = cfg.condition_module
    em = cfg.emo_condition_module
    ref = RefUV(
        layers=cfg.layers, model_dim=cfg.model_dim, heads=cfg.heads,
        max_text_tokens=cfg.max_text_tokens, max_mel_tokens=cfg.max_mel_tokens,
        number_text_tokens=cfg.number_text_tokens,
        number_mel_codes=cfg.number_mel_codes,
        start_mel_token=cfg.start_mel_token, stop_mel_token=cfg.stop_mel_token,
        condition_num_latent=cfg.condition_num_latent,
        condition_type=cfg.condition_type,
        condition_module={
            "output_size": cm.output_size, "linear_units": cm.linear_units,
            "attention_heads": cm.attention_heads, "num_blocks": cm.num_blocks,
            "input_layer": cm.input_layer, "perceiver_mult": cm.perceiver_mult},
        emo_condition_module={
            "output_size": em.output_size, "linear_units": em.linear_units,
            "attention_heads": em.attention_heads, "num_blocks": em.num_blocks,
            "input_layer": em.input_layer, "perceiver_mult": em.perceiver_mult},
    )
    ref.eval()
    return ref


@pytest.fixture(scope="module")
def ref_and_params():
    if not reference_available():
        pytest.skip("reference repo not mounted")
    install_reference_gpt()
    # reference hard-codes 1024-dim conditioning inputs; patch the conformers
    # to the tiny width by rebuilding with input_size via monkeyable ctor —
    # instead we just feed 1024-dim inputs with a tiny conformer? No: the
    # ConformerEncoder input_size is fixed at 1024 inside model_v2, so tiny
    # tests use input_size=1024 truncated frames.
    cfg = TINY
    ref = _build_reference(cfg)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_unified_voice(sd)
    return cfg, ref, params


def test_conditioning_parity(ref_and_params):
    import torch
    cfg, ref, params = ref_and_params
    model = UnifiedVoice(cfg)

    rng = np.random.default_rng(0)
    spk = rng.normal(size=(1, 21, 1024)).astype(np.float32) * 0.3
    lengths = np.array([21], dtype=np.int32)

    with torch.no_grad():
        ref_cond = ref.get_conditioning(
            torch.from_numpy(spk).transpose(1, 2), torch.tensor([21])).numpy()

    ours = np.asarray(model.apply(params, jnp.asarray(spk), jnp.asarray(lengths),
                                  method=UnifiedVoice.get_conditioning))
    assert ours.shape == ref_cond.shape
    np.testing.assert_allclose(ours, ref_cond, atol=2e-4, rtol=1e-3)


@needs_ref
@pytest.mark.parametrize("variant", ["conv2d", "conv2d6", "conv2d8", "linear"])
def test_conditioning_parity_subsampling_variants(variant):
    """All reference subsampling variants (`conformer_encoder.py:374-385`):
    conv2d (4x, the reference signature DEFAULT at `conformer_encoder.py:325`),
    conv2d6, conv2d8, linear — converted weights, get_conditioning parity."""
    import dataclasses

    import torch
    install_reference_gpt()
    cfg = dataclasses.replace(
        TINY,
        condition_module=dataclasses.replace(
            TINY.condition_module, input_layer=variant),
        emo_condition_module=dataclasses.replace(
            TINY.emo_condition_module, input_layer=variant))
    ref = _build_reference(cfg)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_unified_voice(sd)
    model = UnifiedVoice(cfg)

    rng = np.random.default_rng(8)
    t = 35  # survives 8x subsampling
    spk = rng.normal(size=(1, t, 1024)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_cond = ref.get_conditioning(
            torch.from_numpy(spk).transpose(1, 2), torch.tensor([t])).numpy()
    ours = np.asarray(model.apply(
        params, jnp.asarray(spk), jnp.asarray([t], dtype=jnp.int32),
        method=UnifiedVoice.get_conditioning))
    assert ours.shape == ref_cond.shape
    np.testing.assert_allclose(ours, ref_cond, atol=2e-4, rtol=1e-3)


@needs_ref
def test_conditioning_parity_perceiver_branch():
    """The reference ctor-DEFAULT branch `condition_type="perceiver"`
    (`model_v2.py:310,349-350`): Conv1d + 6 AttentionBlocks +
    PerceiverResampler at resampler defaults.  Converted weights,
    get_conditioning parity vs the actual reference module."""
    import dataclasses

    import torch
    install_reference_gpt()
    cfg = dataclasses.replace(TINY, condition_type="perceiver")
    ref = _build_reference(cfg)
    with torch.no_grad():
        # the reference zero-inits proj_out (`arch_util.py:109`), which would
        # reduce every AttentionBlock to identity and make this test vacuous;
        # randomize so the attention path actually contributes
        for blk in ref.conditioning_encoder.attn:
            blk.proj_out.weight.normal_(0, 0.05)
            blk.proj_out.bias.normal_(0, 0.05)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_unified_voice(sd)
    model = UnifiedVoice(cfg)

    rng = np.random.default_rng(5)
    t = 21
    spk = rng.normal(size=(1, t, 1024)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_cond = ref.get_conditioning(
            torch.from_numpy(spk).transpose(1, 2)).numpy()
    ours = np.asarray(model.apply(
        params, jnp.asarray(spk),
        method=UnifiedVoice.get_conditioning))
    assert ours.shape == ref_cond.shape
    np.testing.assert_allclose(ours, ref_cond, atol=2e-4, rtol=1e-3)


@needs_ref
def test_conditioning_parity_default_mean_branch():
    """The reference's FUNCTIONAL default arm: any condition_type outside
    the named set builds `ConditioningEncoder(1024, dim, mean=True)`
    (`model_v2.py:366`) and get_conditioning mean-pools over a singleton
    clip axis to (B, 1, dim) (`model_v2.py:533-545`).  Converted weights,
    parity vs the actual reference module."""
    import dataclasses

    import torch
    install_reference_gpt()
    cfg = dataclasses.replace(TINY, condition_type="default")
    ref = _build_reference(cfg)
    with torch.no_grad():
        # zero-init proj_out would make every AttentionBlock an identity
        # (see the perceiver-branch test); randomize so attention contributes
        for blk in ref.conditioning_encoder.attn:
            blk.proj_out.weight.normal_(0, 0.05)
            blk.proj_out.bias.normal_(0, 0.05)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_unified_voice(sd)
    model = UnifiedVoice(cfg)

    rng = np.random.default_rng(6)
    t = 19
    spk = rng.normal(size=(1, t, 1024)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_cond = ref.get_conditioning(
            torch.from_numpy(spk).transpose(1, 2)).numpy()
    ours = np.asarray(model.apply(
        params, jnp.asarray(spk),
        method=UnifiedVoice.get_conditioning))
    assert ref_cond.shape[1] == 1  # mean-pooled single latent
    assert ours.shape == ref_cond.shape
    np.testing.assert_allclose(ours, ref_cond, atol=2e-4, rtol=1e-3)

    from voice_tts_tpu.models.gpt.unified_voice import n_cond_latents
    assert n_cond_latents(cfg) == 1
    assert n_cond_latents(TINY) == TINY.condition_num_latent


def test_emovec_parity(ref_and_params):
    import torch
    cfg, ref, params = ref_and_params
    model = UnifiedVoice(cfg)

    rng = np.random.default_rng(1)
    emo = rng.normal(size=(1, 17, 1024)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_vec = ref.get_emovec(torch.from_numpy(emo),
                                 torch.tensor([17])).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(emo),
                                  jnp.asarray([17], dtype=jnp.int32),
                                  method=UnifiedVoice.get_emovec))
    np.testing.assert_allclose(ours, ref_vec, atol=2e-4, rtol=1e-3)


def test_forward_latent_parity(ref_and_params):
    import torch
    cfg, ref, params = ref_and_params
    model = UnifiedVoice(cfg)

    rng = np.random.default_rng(2)
    spk = rng.normal(size=(1, 21, 1024)).astype(np.float32) * 0.3
    emo = rng.normal(size=(1, 17, 1024)).astype(np.float32) * 0.3
    text = rng.integers(2, 30, size=(1, 9)).astype(np.int32)
    codes = rng.integers(0, 60, size=(1, 13)).astype(np.int32)

    with torch.no_grad():
        ref_latent = ref(
            torch.from_numpy(spk),  # (B, T, 1024); forward transposes internally
            torch.from_numpy(text.astype(np.int64)), torch.tensor([9]),
            torch.from_numpy(codes.astype(np.int64)), torch.tensor([13]),
            torch.from_numpy(emo),
            cond_mel_lengths=torch.tensor([21]),
            emo_cond_mel_lengths=torch.tensor([17]),
            emo_vec=None, use_speed=torch.zeros(1).long(),
            do_spk_cond=True,
        ).numpy()

    cond = model.apply(params, jnp.asarray(spk), jnp.asarray([21], dtype=jnp.int32),
                       method=UnifiedVoice.get_conditioning)
    emovec = model.apply(params, jnp.asarray(emo), jnp.asarray([17], dtype=jnp.int32),
                         method=UnifiedVoice.get_emovec)
    ours = np.asarray(model.apply(
        params, cond, emovec, jnp.asarray(text), jnp.asarray([9], dtype=jnp.int32),
        jnp.asarray(codes), jnp.asarray([13], dtype=jnp.int32)))
    assert ours.shape == ref_latent.shape
    np.testing.assert_allclose(ours, ref_latent, atol=5e-4, rtol=1e-3)


def test_decode_incremental_consistency():
    """Greedy incremental decode must equal greedy decode re-derived from
    full teacher-forced forwards (KV-cache correctness)."""
    cfg = TINY
    model = UnifiedVoice(cfg)
    rng = np.random.default_rng(3)
    text = rng.integers(2, 30, size=(1, 7)).astype(np.int32)

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 6, 1024)), jnp.asarray(text),
                        jnp.asarray([7]), jnp.zeros((1, 5), dtype=jnp.int32),
                        jnp.asarray([5]), method=UnifiedVoice.init_all)
    cond = jnp.asarray(rng.normal(size=(1, 4, cfg.model_dim)).astype(np.float32) * 0.1)
    emovec = jnp.asarray(rng.normal(size=(1, cfg.model_dim)).astype(np.float32) * 0.1)

    gen = GenerationConfig(do_sample=False, repetition_penalty=1.0, num_beams=1)
    res = decode(params, model, gen, cond, emovec, jnp.asarray(text),
                 jnp.asarray([7], dtype=jnp.int32), jax.random.PRNGKey(1),
                 max_new=8)
    codes = np.asarray(res.codes)[0]

    # oracle: rebuild each step's logits with the no-cache full forward over
    # [prompt | start | generated-so-far]
    prompt, valid = model.apply(params, cond, emovec, jnp.asarray(text),
                                jnp.asarray([7], dtype=jnp.int32),
                                method=UnifiedVoice.build_prompt)

    def step_logits(n_prefix):
        toks = [int(c) for c in codes[:n_prefix]]
        mel_in = jnp.asarray([[cfg.start_mel_token] + toks], dtype=jnp.int32)
        pos = jnp.arange(mel_in.shape[1])

        def run(m):
            mel_emb = m.mel_embedding(mel_in) + m.mel_pos_embedding(pos)[None]
            emb = jnp.concatenate([prompt, mel_emb], axis=1)
            vmask = jnp.concatenate(
                [valid, jnp.ones((1, mel_in.shape[1]), dtype=bool)], axis=1)
            hidden, _ = m.gpt(emb, None, 0, vmask)
            return m.mel_head(m.final_norm(hidden[:, -1]))

        return np.asarray(model.apply(params, method=run))

    for n in range(4):
        logits = step_logits(n)
        expect = int(np.argmax(logits[0]))
        assert expect == int(codes[n]), f"mismatch at step {n}"


def test_decode_int8_kv_xla_close_to_float():
    """Batched XLA decode with the int8 QuantKVCache: same mechanism as the
    float cache, logits within quantization tolerance (greedy codes equal on
    this model), batch > 1 (the serving path the cache targets)."""
    cfg = TINY
    model = UnifiedVoice(cfg)
    rng = np.random.default_rng(9)
    text = rng.integers(2, 30, size=(2, 7)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 6, 1024)), jnp.asarray(text[:1]),
                        jnp.asarray([7]), jnp.zeros((1, 5), dtype=jnp.int32),
                        jnp.asarray([5]), method=UnifiedVoice.init_all)
    cond = jnp.asarray(rng.normal(size=(2, 4, cfg.model_dim)) * 0.1
                       ).astype(jnp.float32)
    emovec = jnp.asarray(rng.normal(size=(2, cfg.model_dim)) * 0.1
                         ).astype(jnp.float32)
    lens = jnp.asarray([7, 5], dtype=jnp.int32)
    gen = GenerationConfig(do_sample=False, repetition_penalty=1.0,
                           num_beams=1)
    ref = decode(params, model, gen, cond, emovec, jnp.asarray(text), lens,
                 jax.random.PRNGKey(1), max_new=8)
    q = decode(params, model, gen, cond, emovec, jnp.asarray(text), lens,
               jax.random.PRNGKey(1), max_new=8, int8_kv=True)
    assert q.codes.shape == ref.codes.shape
    # greedy argmax is stable under ~0.5% kv quantization error here
    np.testing.assert_array_equal(np.asarray(q.codes), np.asarray(ref.codes))
    np.testing.assert_array_equal(np.asarray(q.lengths),
                                  np.asarray(ref.lengths))


def test_quant_kv_cache_attention_close():
    """One GPT2Stack prefill + step: quantized-cache hidden states track the
    float-cache hidden states to within int8 quantization error."""
    from voice_tts_tpu.models.gpt.gpt2 import GPT2Stack

    stack = GPT2Stack(layers=2, dim=64, heads=4)
    rng = np.random.default_rng(12)
    emb = jnp.asarray(rng.normal(size=(2, 5, 64)) * 0.3).astype(jnp.float32)
    params = stack.init(jax.random.PRNGKey(3), emb)
    fcache = stack.init_cache(2, 16)
    qcache = stack.init_quant_cache(2, 16)
    valid = jnp.ones((2, 16), dtype=bool)

    h_f, fcache = stack.apply(params, emb, fcache, 0, valid)
    h_q, qcache = stack.apply(params, emb, qcache, 0, valid)
    np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_f),
                               atol=3e-2, rtol=3e-2)

    nxt = jnp.asarray(rng.normal(size=(2, 1, 64)) * 0.3).astype(jnp.float32)
    h_f2, _ = stack.apply(params, nxt, fcache, 5, valid)
    h_q2, _ = stack.apply(params, nxt, qcache, 5, valid)
    np.testing.assert_allclose(np.asarray(h_q2), np.asarray(h_f2),
                               atol=3e-2, rtol=3e-2)


def test_decode_sampling_runs_and_stops():
    cfg = TINY
    model = UnifiedVoice(cfg)
    rng = np.random.default_rng(4)
    text = rng.integers(2, 30, size=(1, 7)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 6, 1024)), jnp.asarray(text),
                        jnp.asarray([7]), jnp.zeros((1, 5), dtype=jnp.int32),
                        jnp.asarray([5]), method=UnifiedVoice.init_all)
    cond = jnp.zeros((1, 4, cfg.model_dim))
    emovec = jnp.zeros((1, cfg.model_dim))
    gen = GenerationConfig(do_sample=True, top_k=10, top_p=0.9, temperature=1.0,
                           repetition_penalty=2.0, num_beams=1)
    res = decode(params, model, gen, cond, emovec, jnp.asarray(text),
                 jnp.asarray([7], dtype=jnp.int32), jax.random.PRNGKey(2),
                 max_new=12)
    codes = np.asarray(res.codes)
    assert codes.shape == (1, 12)
    assert codes.min() >= 0 and codes.max() < cfg.number_mel_codes
    lengths = np.asarray(res.lengths)
    assert 1 <= lengths[0] <= 12


def test_fast_sampler_matches_hf_order_warping():
    """sample_token's candidate-space warping == full-vocab process_logits."""
    from voice_tts_tpu.models.gpt.decode import process_logits, sample_token

    gen = GenerationConfig(do_sample=True, top_k=5, top_p=0.8, temperature=0.7,
                           repetition_penalty=3.0, num_beams=1)
    rng = np.random.default_rng(0)
    for trial in range(5):
        logits = jnp.asarray(rng.normal(size=(2, 40)).astype(np.float32) * 3)
        presence = jnp.asarray(rng.random((2, 40)) < 0.2)
        slow = np.asarray(process_logits(logits, presence, gen))
        # distribution support must match: sample many tokens from each path
        keys = jax.random.split(jax.random.PRNGKey(trial), 200)
        fast_tokens = {int(sample_token(logits, presence, gen, k)[0])
                       for k in keys}
        slow_probs = np.asarray(jax.nn.softmax(slow, axis=-1))[0]
        slow_support = {i for i, p in enumerate(slow_probs) if p > 1e-6}
        assert fast_tokens <= slow_support
        # every high-probability slow token appears in fast samples
        likely = {i for i, p in enumerate(slow_probs) if p > 0.05}
        assert likely <= fast_tokens


def test_fast_sampler_greedy_matches_argmax():
    from voice_tts_tpu.models.gpt.decode import sample_token

    gen = GenerationConfig(do_sample=False, repetition_penalty=2.0, num_beams=1)
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(1, 30)).astype(np.float32))
    presence = jnp.zeros((1, 30), dtype=bool).at[0, 5].set(True)
    tok = sample_token(logits, presence, gen, jax.random.PRNGKey(0))
    penalized = np.asarray(logits).copy()
    v = penalized[0, 5]
    penalized[0, 5] = v / 2.0 if v > 0 else v * 2.0
    assert int(tok[0]) == int(np.argmax(penalized))


def test_beam_search_parity_with_reference(ref_and_params):
    """Deterministic beam search (do_sample=False, K=3, rep penalty) must
    produce the same best hypothesis as the reference HF beam path."""
    import torch
    cfg, ref, params = ref_and_params
    from voice_tts_tpu.models.gpt.beam import beam_decode

    ref.post_init_gpt2_config(use_deepspeed=False, kv_cache=True, half=False)
    rng = np.random.default_rng(5)
    spk = (rng.normal(size=(1, 21, 1024)) * 0.3).astype(np.float32)
    text = rng.integers(2, 30, size=(1, 7)).astype(np.int32)

    with torch.no_grad():
        ref_codes, _ = ref.inference_speech(
            torch.from_numpy(spk), torch.from_numpy(text.astype(np.int64)),
            cond_lengths=torch.tensor([21]),
            do_sample=False, num_beams=3, repetition_penalty=10.0,
            max_generate_length=16, num_return_sequences=1)
    ref_codes = ref_codes.numpy()[0]
    # HF appends the stop token when the hypothesis finished early
    ref_hyp = ref_codes[:-1] if ref_codes[-1] == cfg.stop_mel_token else ref_codes

    model = UnifiedVoice(cfg)
    cond = model.apply(params, jnp.asarray(spk), jnp.asarray([21], dtype=jnp.int32),
                       method=UnifiedVoice.get_conditioning)
    emovec = model.apply(params, jnp.asarray(spk), jnp.asarray([21], dtype=jnp.int32),
                         method=UnifiedVoice.get_emovec)
    gen = GenerationConfig(do_sample=False, num_beams=3,
                           repetition_penalty=10.0, length_penalty=0.0)
    res = beam_decode(params, model, gen, cond, emovec, jnp.asarray(text),
                      jnp.asarray([7], dtype=jnp.int32), jax.random.PRNGKey(0),
                      max_new=16)
    length = int(np.asarray(res.lengths)[0])
    hit = bool(np.asarray(res.hit_limit)[0])
    mine = np.asarray(res.codes)[0][: length - (0 if hit else 1)]
    np.testing.assert_array_equal(mine, ref_hyp)


def test_beam_sampling_runs():
    from voice_tts_tpu.models.gpt.beam import beam_decode

    cfg = TINY
    model = UnifiedVoice(cfg)
    rng = np.random.default_rng(6)
    text = rng.integers(2, 30, size=(1, 7)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 6, 1024)), jnp.asarray(text),
                        jnp.asarray([7]), jnp.zeros((1, 5), dtype=jnp.int32),
                        jnp.asarray([5]), method=UnifiedVoice.init_all)
    cond = jnp.asarray(rng.normal(size=(1, 4, cfg.model_dim)).astype(np.float32) * 0.1)
    emovec = jnp.asarray(rng.normal(size=(1, cfg.model_dim)).astype(np.float32) * 0.1)
    gen = GenerationConfig(do_sample=True, num_beams=3, top_k=10, top_p=0.9,
                           temperature=0.9, repetition_penalty=8.0)
    res = beam_decode(params, model, gen, cond, emovec, jnp.asarray(text),
                      jnp.asarray([7], dtype=jnp.int32), jax.random.PRNGKey(1),
                      max_new=12)
    codes = np.asarray(res.codes)
    assert codes.shape == (1, 12)
    assert codes.min() >= 0 and codes.max() < cfg.number_mel_codes


def test_beam_batch_matches_single():
    """vmapped batched beam == per-request beam_decode, row by row
    (deterministic beams so the rng path doesn't enter)."""
    from voice_tts_tpu.models.gpt.beam import beam_decode, beam_decode_batch

    cfg = TINY
    model = UnifiedVoice(cfg)
    rng = np.random.default_rng(7)
    b, tl = 3, 7
    text = rng.integers(2, 30, size=(b, tl)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 6, 1024)), jnp.asarray(text[:1]),
                        jnp.asarray([tl]), jnp.zeros((1, 5), dtype=jnp.int32),
                        jnp.asarray([5]), method=UnifiedVoice.init_all)
    cond = jnp.asarray(rng.normal(size=(b, 4, cfg.model_dim)).astype(np.float32) * 0.1)
    emovec = jnp.asarray(rng.normal(size=(b, cfg.model_dim)).astype(np.float32) * 0.1)
    lens = jnp.asarray([tl, tl - 2, tl - 1], dtype=jnp.int32)
    gen = GenerationConfig(do_sample=False, num_beams=3,
                           repetition_penalty=10.0, length_penalty=0.0)

    batched = beam_decode_batch(params, model, gen, cond, emovec,
                                jnp.asarray(text), lens, jax.random.PRNGKey(1),
                                max_new=10)
    for i in range(b):
        single = beam_decode(params, model, gen, cond[i:i + 1],
                             emovec[i:i + 1], jnp.asarray(text[i:i + 1]),
                             lens[i:i + 1], jax.random.PRNGKey(9),
                             max_new=10)
        np.testing.assert_array_equal(np.asarray(batched.codes[i]),
                                      np.asarray(single.codes[0]))
        assert int(batched.lengths[i]) == int(single.lengths[0])
        assert bool(batched.hit_limit[i]) == bool(single.hit_limit[0])


def test_warp_candidate_space_matches_full_vocab():
    """`beam.warp_candidate_space` scattered back over a float-min canvas
    must reproduce the full-vocab warper chain apply_top_p(apply_top_k(s))
    exactly — the beam sampling refactor that removes the per-step
    full-vocab argsort rests on this identity."""
    import jax
    import jax.numpy as jnp

    from voice_tts_tpu.models.gpt.beam import warp_candidate_space
    from voice_tts_tpu.models.gpt.decode import apply_top_k, apply_top_p

    rng = np.random.default_rng(3)
    for k_beams, tk, tp, v in [(3, 30, 0.8, 512), (3, 4, 0.9, 97),
                               (2, 0, 0.5, 64), (4, 30, 1.0, 256),
                               (3, 2, 0.8, 128)]:  # tk < 2K: rank padding
        s = jnp.asarray(rng.normal(size=(k_beams, v)).astype(np.float32) * 3)
        ref = apply_top_p(apply_top_k(s, tk), tp)
        top_vals, top_idx = warp_candidate_space(s, tk, tp, n_keep=2 * k_beams)
        fmin = jnp.finfo(jnp.float32).min
        got = jnp.full((k_beams, v), fmin)
        got = got.at[jnp.arange(k_beams)[:, None], top_idx].max(top_vals)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=f"k={k_beams} tk={tk} tp={tp}")
