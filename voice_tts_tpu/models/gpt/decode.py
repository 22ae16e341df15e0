"""Fixed-shape autoregressive decode loop for UnifiedVoice.

Replaces the reference's HF `generate` call stack
(`transformers_generation_utils.py:3123-3260` sampling loop) with a jitted
`lax.while_loop` over a preallocated KV cache.  Logit processing matches the
HF order and semantics for the reference's defaults
(`infer_v2.py:598-606`): repetition penalty -> temperature -> top-k -> top-p
-> categorical sample (or argmax when do_sample=False).

HF's repetition penalty sees the fake prompt ids (all ones) plus the start
token (`model_v2.py:652-660`), so token ids {1, start_mel_token} start out
"seen" — reproduced here with a vocab presence mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from voice_tts_tpu.config import GPTConfig, GenerationConfig
from voice_tts_tpu.models.gpt.unified_voice import UnifiedVoice, n_cond_latents
from voice_tts_tpu.ops.fused_decode import (FusedDecodePack, apply_kv_update,
                                            apply_kv_update_batch,
                                            apply_kv_update_q,
                                            apply_kv_update_q_batch,
                                            apply_kv_update_span,
                                            cache_to_time_major,
                                            fused_decode_step,
                                            fused_decode_step_batch,
                                            fused_decode_verify,
                                            quantize_kv_cache,
                                            quantize_kv_cache_batch,
                                            BLOCK_T as FUSED_BLOCK_T)


class DecodeResult(NamedTuple):
    codes: jnp.ndarray       # (B, max_new) generated mel codes (stop-padded)
    lengths: jnp.ndarray     # (B,) codes per row *including* the stop token
    hit_limit: jnp.ndarray   # (B,) True if stopped by max length, not stop token


def apply_repetition_penalty(logits: jnp.ndarray, presence: jnp.ndarray,
                             penalty: float) -> jnp.ndarray:
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(presence, penalized, logits)


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0:
        return logits
    k = min(k, logits.shape[-1])
    thresh = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < thresh, jnp.finfo(logits.dtype).min, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """HF TopPLogitsWarper semantics (ascending sort, keep >= 1 token)."""
    if p >= 1.0:
        return logits
    sort_idx = jnp.argsort(logits, axis=-1)  # ascending
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cum <= (1.0 - p)
    remove_sorted = remove_sorted.at[..., -1].set(False)  # min_tokens_to_keep=1
    inv = jnp.argsort(sort_idx, axis=-1)
    remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
    return jnp.where(remove, jnp.finfo(logits.dtype).min, logits)


def apply_typical(logits: jnp.ndarray, mass: float,
                  min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """Entropy-typical filtering (HF TypicalLogitsWarper semantics; optional
    path enabled by `inference_speech(typical_sampling=True)`, reference
    `utils/typical_sampling.py:4-30`)."""
    norm = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(norm)
    ent = -jnp.sum(norm * p, axis=-1, keepdims=True)
    shifted = jnp.abs(-norm - ent)
    order = jnp.argsort(shifted, axis=-1)  # ascending: most typical first
    sorted_p = jnp.take_along_axis(p, order, axis=-1)
    cum = jnp.cumsum(sorted_p, axis=-1)
    last_ind = jnp.sum((cum < mass).astype(jnp.int32), axis=-1, keepdims=True)
    last_ind = jnp.maximum(last_ind, min_tokens_to_keep - 1)
    rank = jnp.argsort(order, axis=-1)
    remove = rank > last_ind
    return jnp.where(remove, jnp.finfo(logits.dtype).min, logits)


def process_logits(logits, presence, gen: GenerationConfig):
    logits = apply_repetition_penalty(logits, presence, gen.repetition_penalty)
    if gen.typical_sampling:
        logits = apply_typical(logits, gen.typical_mass,
                               2 if gen.num_beams > 1 else 1)
    if gen.do_sample:
        if gen.temperature != 1.0:
            logits = logits / gen.temperature
        logits = apply_top_k(logits, gen.top_k)
        logits = apply_top_p(logits, gen.top_p)
    return logits


def sample_token(logits, presence, gen: GenerationConfig, rng):
    """One sampling step, TPU-fast path.

    Equivalent to `process_logits` + categorical/argmax, but top-p runs in the
    (already descending-sorted) top-k candidate space, avoiding the
    full-vocab argsort: ascending-HF "remove while cumulative <= 1-p" is
    "remove j when cumulative-before-j >= p" in descending order.

    The (rare, opt-in) typical-sampling path keeps the full-vocab pipeline.
    """
    if gen.typical_sampling:
        rng2 = rng
        warped = process_logits(logits, presence, gen)
        if gen.do_sample:
            return jax.random.categorical(rng2, warped, axis=-1).astype(jnp.int32)
        return jnp.argmax(warped, axis=-1).astype(jnp.int32)
    logits = apply_repetition_penalty(logits, presence, gen.repetition_penalty)
    if not gen.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if gen.temperature != 1.0:
        logits = logits / gen.temperature
    k = min(gen.top_k if gen.top_k > 0 else logits.shape[-1], logits.shape[-1])
    top_vals, top_idx = jax.lax.top_k(logits, k)           # descending
    if gen.top_p < 1.0:
        probs = jax.nn.softmax(top_vals, axis=-1)
        before = jnp.cumsum(probs, axis=-1) - probs
        top_vals = jnp.where(before >= gen.top_p,
                             jnp.finfo(top_vals.dtype).min, top_vals)
    choice = jax.random.categorical(rng, top_vals, axis=-1)
    return jnp.take_along_axis(top_idx, choice[:, None], axis=-1)[:, 0].astype(
        jnp.int32)


class _LoopState(NamedTuple):
    step: jnp.ndarray
    token: jnp.ndarray       # (B,) last sampled token
    cache: jnp.ndarray
    presence: jnp.ndarray    # (B, V) repetition-penalty memory
    codes: jnp.ndarray       # (B, max_new)
    finished: jnp.ndarray    # (B,)
    lengths: jnp.ndarray     # (B,)
    rng: jax.Array


@functools.partial(jax.jit,
                   static_argnames=("model", "gen", "max_new", "int8_kv",
                                    "int4_expand", "merge_stages",
                                    "fused_batch"))
def decode(params, model: UnifiedVoice, gen: GenerationConfig,
           cond_latents: jnp.ndarray, emo_vec: jnp.ndarray,
           text_tokens: jnp.ndarray, text_lengths: jnp.ndarray,
           rng: jax.Array, max_new: int,
           fused_pack: Optional[FusedDecodePack] = None,
           int8_kv: bool = False, int4_expand: bool = False,
           merge_stages: bool | int = False,
           fused_batch: bool = False,
           readout_pack=None) -> DecodeResult:
    """Greedy/sampling AR decode (num_beams=1 path).

    text_tokens (B, bucket_len) right-padded; returns up to `max_new` codes.
    Compute dtype follows the parameters (pass a bf16-cast tree for bf16
    decode; logits/sampling stay fp32).  When `fused_pack` is given (int8
    tiles from `ops.fused_decode.pack_gpt`) and batch == 1, each step runs
    the single-Pallas-call trunk megakernel instead of the XLA stack; with
    `fused_batch=True` batches 2..8 use the batched megakernel
    (`fused_decode_step_batch` — reads only the live KV prefix instead of
    the full padded cache, the dominant batch >= 8 serving traffic).
    `int8_kv` (fused paths, or score-folded on the XLA path) stores the KV
    cache int8 with per-position scales — halves the prefix DMA that
    dominates late decode steps.
    """
    cfg: GPTConfig = model.cfg
    b, bl = text_tokens.shape
    use_fused = (fused_pack is not None and b == 1
                 and not cfg.pallas_decode_attention)
    use_fused_b = (fused_pack is not None and fused_batch and 1 < b <= 8
                   and not cfg.pallas_decode_attention)
    # int8 KV on the XLA path needs the plain-attention branch (the Pallas
    # decode-attention kernel reads a float cache)
    int8_kv_xla = (int8_kv and not use_fused and not use_fused_b
                   and not cfg.pallas_decode_attention)
    int8_kv = int8_kv and (use_fused or use_fused_b)
    p = n_cond_latents(cfg) + 2 + bl + 2  # conds(34) + start/text/stop
    t_max = p + 1 + max_new
    if cfg.pallas_decode_attention:
        t_max += (-t_max) % 512  # kernel block granularity
    elif use_fused or use_fused_b:
        t_max += (-t_max) % FUSED_BLOCK_T
    vocab = cfg.number_mel_codes

    param_dtype = jax.tree.leaves(params)[0].dtype
    cond_latents = cond_latents.astype(param_dtype)
    emo_vec = emo_vec.astype(param_dtype)

    prompt, valid_p = model.apply(
        params, cond_latents, emo_vec, text_tokens, text_lengths,
        method=UnifiedVoice.build_prompt)
    valid = jnp.concatenate(
        [valid_p, jnp.ones((b, t_max - p), dtype=bool)], axis=1)

    hd = cfg.model_dim // cfg.heads
    if int8_kv_xla:
        from voice_tts_tpu.models.gpt.gpt2 import QuantKVCache
        cache0 = QuantKVCache(
            jnp.zeros((cfg.layers, 2, b, cfg.heads, hd, t_max),
                      dtype=jnp.int8),
            jnp.full((cfg.layers, 2, b, cfg.heads, t_max), 1e-12,
                     dtype=jnp.float32))
    else:
        cache0 = jnp.zeros((cfg.layers, 2, b, cfg.heads, hd, t_max),
                           dtype=prompt.dtype)
    logits0, cache = model.apply(params, prompt, valid_p, cache0,
                                 method=UnifiedVoice.prefill)

    presence0 = jnp.zeros((b, vocab), dtype=bool)
    presence0 = presence0.at[:, 1].set(True)                  # fake input ids
    presence0 = presence0.at[:, cfg.start_mel_token].set(True)

    def sample_from(logits, presence, rng):
        rng, sub = jax.random.split(rng)
        return sample_token(logits, presence, gen, sub), rng

    token0, rng = sample_from(logits0, presence0, rng)
    presence = presence0.at[jnp.arange(b), token0].set(True)
    codes = jnp.full((b, max_new), cfg.stop_mel_token, dtype=jnp.int32)
    codes = codes.at[:, 0].set(token0)
    finished0 = token0 == cfg.stop_mel_token
    lengths0 = jnp.ones((b,), dtype=jnp.int32)

    def cond_fn(s: _LoopState):
        return (s.step < max_new) & ~jnp.all(s.finished)

    if use_fused:
        # (Tmax, 1) additive mask over cache positions (batch == 1)
        attn_bias = jnp.where(valid[0, :, None], 0.0, -1e30).astype(jnp.float32)
        cache = cache_to_time_major(cache)
        if int8_kv:
            cache = quantize_kv_cache(cache)  # (int8 cache, scales) pair
        interp = jax.default_backend() != "tpu"
    elif use_fused_b:
        # (B, Tmax) per-row additive mask over cache positions
        attn_bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)
        cache = cache_to_time_major(cache)
        if int8_kv:
            cache = quantize_kv_cache_batch(cache)
        interp = jax.default_backend() != "tpu"

    def body_fn(s: _LoopState):
        if use_fused_b:
            emb = model.apply(params, s.token, s.step - 1,
                              method=UnifiedVoice.embed_decode_token)
            kv_c, kv_s = s.cache if int8_kv else (s.cache, None)
            if readout_pack is not None:
                _, kv_new, logits_pad = fused_decode_step_batch(
                    emb, fused_pack, kv_c, attn_bias, p + s.step, cfg.heads,
                    interpret=interp, kv_scales=kv_s,
                    int4_expand=int4_expand, merge_stages=merge_stages,
                    readout_pack=readout_pack)
                logits = logits_pad[:, :vocab]
            else:
                hidden, kv_new = fused_decode_step_batch(
                    emb, fused_pack, kv_c, attn_bias, p + s.step, cfg.heads,
                    interpret=interp, kv_scales=kv_s,
                    int4_expand=int4_expand, merge_stages=merge_stages)
                logits = model.apply(params, hidden,
                                     method=UnifiedVoice.readout)
            if int8_kv:
                cache = apply_kv_update_q_batch(kv_c, kv_s, kv_new,
                                                p + s.step)
            else:
                cache = apply_kv_update_batch(s.cache, kv_new, p + s.step)
        elif use_fused:
            emb = model.apply(params, s.token, s.step - 1,
                              method=UnifiedVoice.embed_decode_token)
            kv_c, kv_s = s.cache if int8_kv else (s.cache, None)
            if readout_pack is not None:
                # folded readout: logits come straight out of the megakernel
                # (int8 mel_head tiles streamed through the same pipeline)
                _, kv_new, logits_pad = fused_decode_step(
                    emb, fused_pack, kv_c, attn_bias, p + s.step, cfg.heads,
                    interpret=interp, kv_scales=kv_s,
                    int4_expand=int4_expand, merge_stages=merge_stages,
                    readout_pack=readout_pack)
                logits = logits_pad[:, :vocab]
            else:
                hidden, kv_new = fused_decode_step(
                    emb, fused_pack, kv_c, attn_bias, p + s.step, cfg.heads,
                    interpret=interp, kv_scales=kv_s,
                    int4_expand=int4_expand, merge_stages=merge_stages)
                logits = model.apply(params, hidden,
                                     method=UnifiedVoice.readout)
            if int8_kv:
                cache = apply_kv_update_q(kv_c, kv_s, kv_new, p + s.step)
            else:
                cache = apply_kv_update(s.cache, kv_new, p + s.step)
        else:
            logits, cache = model.apply(
                params, s.token, s.step - 1, p + s.step, valid, s.cache,
                method=UnifiedVoice.decode_step)
        token, rng = sample_from(logits, s.presence, s.rng)
        token = jnp.where(s.finished, cfg.stop_mel_token, token)
        presence = s.presence.at[jnp.arange(b), token].set(True)
        codes = jax.lax.dynamic_update_slice(
            s.codes, token[:, None], (0, s.step))
        newly_finished = token == cfg.stop_mel_token
        lengths = jnp.where(s.finished, s.lengths, s.step + 1)
        return _LoopState(s.step + 1, token, cache, presence, codes,
                          s.finished | newly_finished, lengths, rng)

    init = _LoopState(jnp.asarray(1), token0, cache, presence, codes,
                      finished0, lengths0, rng)
    final = jax.lax.while_loop(cond_fn, body_fn, init)
    return DecodeResult(final.codes, final.lengths, ~final.finished)


class _SpecState(NamedTuple):
    step: jnp.ndarray        # codes emitted
    token: jnp.ndarray       # (1,) last emitted token
    cache: jnp.ndarray       # time-major (L, 2, 1, Tmax, D)
    presence: jnp.ndarray    # (1, V)
    codes: jnp.ndarray       # (1, max_new)
    finished: jnp.ndarray    # (1,)
    lengths: jnp.ndarray     # (1,)
    rng: jax.Array


@functools.partial(jax.jit,
                   static_argnames=("model", "gen", "max_new", "k_spec",
                                    "int4_expand", "merge_stages"))
def spec_decode(params, model: UnifiedVoice, gen: GenerationConfig,
                cond_latents: jnp.ndarray, emo_vec: jnp.ndarray,
                text_tokens: jnp.ndarray, text_lengths: jnp.ndarray,
                rng: jax.Array, max_new: int,
                pack_target: FusedDecodePack,
                pack_draft, k_spec: int = 4,
                int4_expand: bool = False,
                merge_stages: bool | int = False) -> DecodeResult:
    """Self-speculative AR decode (batch 1, num_beams == 1).

    Draft K-1 tokens with the int4 megakernel (`pack_draft`, ~half the
    weight DMA of int8), then verify ALL of them with ONE int8 megakernel
    pass (`ops.fused_decode.fused_decode_verify` — the weight stream is
    read once per K tokens instead of once per token, which is the whole
    cost of a weight-DMA-bound decode step).  Standard speculative
    REJECTION sampling (Leviathan et al. / Chen et al.) over the WARPED
    distributions (repetition penalty -> temperature -> top-k -> top-p,
    identical pipeline to the non-speculative path): every emitted token is
    distributed EXACTLY as sampling from the int8 target path — int4 only
    affects the acceptance rate, never the output distribution.  Draft and
    target share one KV cache: draft kv rows are scratch that the verify
    pass overwrites with int8-computed kv at the same positions.

    Contract mirrors `decode` (same DecodeResult; stop-token and cap
    semantics identical — drafted tokens past a stop are discarded).
    """
    cfg: GPTConfig = model.cfg
    b, bl = text_tokens.shape
    assert b == 1, "speculative decode is the single-request latency path"
    kk = k_spec
    assert 2 <= kk <= 8
    p = n_cond_latents(cfg) + 2 + bl + 2
    t_max = p + 1 + max_new + kk          # drafts may overhang max_new
    t_max += (-t_max) % FUSED_BLOCK_T
    vocab = cfg.number_mel_codes
    eos = cfg.stop_mel_token
    interp = jax.default_backend() != "tpu"

    param_dtype = jax.tree.leaves(params)[0].dtype
    prompt, valid_p = model.apply(
        params, cond_latents.astype(param_dtype), emo_vec.astype(param_dtype),
        text_tokens, text_lengths, method=UnifiedVoice.build_prompt)
    valid = jnp.concatenate(
        [valid_p, jnp.ones((b, t_max - p), dtype=bool)], axis=1)
    hd = cfg.model_dim // cfg.heads
    cache0 = jnp.zeros((cfg.layers, 2, 1, cfg.heads, hd, t_max),
                      dtype=prompt.dtype)
    logits0, cache = model.apply(params, prompt, valid_p, cache0,
                                 method=UnifiedVoice.prefill)
    cache = cache_to_time_major(cache)
    bias = jnp.where(valid[0, :, None], 0.0, -1e30).astype(jnp.float32)

    presence0 = jnp.zeros((b, vocab), dtype=bool)
    presence0 = presence0.at[:, 1].set(True)
    presence0 = presence0.at[:, cfg.start_mel_token].set(True)

    def warped_logprobs(logits, presence):
        """Full-vocab warped log-probs WITHOUT the full-vocab argsort that
        `apply_top_p` pays: after top-k, top-p can only remove within the
        top-k support, so warp in the (descending) top-k candidate space —
        the same equivalence `sample_token` documents — and scatter back.
        Rejection sampling needs the whole (V,) distribution (draft prob
        of the drafted token + the residual), hence full-vocab output."""
        logits = apply_repetition_penalty(
            logits.astype(jnp.float32), presence, gen.repetition_penalty)
        if gen.typical_sampling:
            return jax.nn.log_softmax(
                process_logits(logits, presence, gen), axis=-1)
        if gen.do_sample:
            if gen.temperature != 1.0:
                logits = logits / gen.temperature
            kk_ = min(gen.top_k if gen.top_k > 0 else logits.shape[-1],
                      logits.shape[-1])
            top_vals, top_idx = jax.lax.top_k(logits, kk_)  # descending
            if gen.top_p < 1.0:
                probs = jax.nn.softmax(top_vals, axis=-1)
                before = jnp.cumsum(probs, axis=-1) - probs
                top_vals = jnp.where(before >= gen.top_p, -jnp.inf, top_vals)
            full = jnp.full_like(logits, -jnp.inf)
            rows = jnp.arange(logits.shape[0])[:, None]
            logits = full.at[rows, top_idx].set(top_vals)
        return jax.nn.log_softmax(logits, axis=-1)

    def draw(rng, logp):
        if gen.do_sample:
            return jax.random.categorical(rng, logp, axis=-1).astype(jnp.int32)
        return jnp.argmax(logp, axis=-1).astype(jnp.int32)

    rng, sub = jax.random.split(rng)
    lp0 = warped_logprobs(logits0, presence0)
    token0 = draw(sub, lp0)
    presence = presence0.at[jnp.arange(b), token0].set(True)
    codes = jnp.full((b, max_new), eos, dtype=jnp.int32)
    codes = codes.at[:, 0].set(token0)
    finished0 = token0 == eos
    lengths0 = jnp.ones((b,), dtype=jnp.int32)

    def cond_fn(s: _SpecState):
        return (s.step < max_new) & ~jnp.all(s.finished)

    def body_fn(s: _SpecState):
        rng = s.rng
        pos0 = p + s.step                      # row-0 (s.token) position
        # ---- draft kk-1 tokens with the int4 pack ----
        embs, d_toks, d_logps, p_ckpts = [], [], [], []
        cache = s.cache
        presence_d = s.presence
        tok = s.token
        for i in range(kk - 1):
            emb = model.apply(params, tok, s.step - 1 + i,
                              method=UnifiedVoice.embed_decode_token)
            embs.append(emb)
            p_ckpts.append(presence_d)
            hidden, kv_new = fused_decode_step(
                emb, pack_draft, cache, bias, pos0 + i, cfg.heads,
                interpret=interp, int4_expand=int4_expand,
                merge_stages=merge_stages)
            cache = apply_kv_update(cache, kv_new, pos0 + i)
            logits_d = model.apply(params, hidden,
                                   method=UnifiedVoice.readout)
            lp_d = warped_logprobs(logits_d, presence_d)
            rng, sub = jax.random.split(rng)
            tok = draw(sub, lp_d)
            d_toks.append(tok)
            d_logps.append(lp_d)
            presence_d = presence_d.at[jnp.arange(b), tok].set(True)
        # last checkpoint: presence after every draft (for the bonus draw)
        emb_last = model.apply(params, tok, s.step - 1 + (kk - 1),
                               method=UnifiedVoice.embed_decode_token)
        embs.append(emb_last)
        p_ckpts.append(presence_d)

        # ---- one int8 verify pass over [s.token, d_0..d_{kk-2}] ----
        x = jnp.concatenate(embs, axis=0)                  # (kk, D)
        hid_v, kv_v = fused_decode_verify(
            x, pack_target, s.cache, bias, pos0, cfg.heads,
            interpret=interp, merge_stages=merge_stages)
        cache = apply_kv_update_span(s.cache, kv_v, pos0)
        logits_t = model.apply(params, hid_v, method=UnifiedVoice.readout)
        # target warped dists, each under the presence its position saw
        lp_t = jnp.stack([
            warped_logprobs(logits_t[i:i + 1], p_ckpts[i])[0]
            for i in range(kk)])                           # (kk, V)

        # ---- rejection sampling over the kk-1 drafts ----
        d_vec = jnp.concatenate(d_toks)                    # (kk-1,)
        lp_d_mat = jnp.concatenate(d_logps)                # (kk-1, V)
        q_at = jnp.stack([lp_t[i, d_vec[i]] for i in range(kk - 1)])
        p_at = jnp.stack([lp_d_mat[i, d_vec[i]] for i in range(kk - 1)])
        if gen.do_sample:
            rng, sub = jax.random.split(rng)
            u = jax.random.uniform(sub, (kk - 1,), minval=1e-20)
            accept = jnp.log(u) < (q_at - p_at)            # clip at 1 implicit
        else:
            # greedy: accept while the draft matches the target argmax
            accept = jnp.stack(
                [jnp.argmax(lp_t[i]) for i in range(kk - 1)]
            ).astype(jnp.int32) == d_vec
        acc_prefix = jnp.cumprod(accept.astype(jnp.int32))
        n_acc = jnp.sum(acc_prefix)                        # leading accepts
        all_acc = n_acc == (kk - 1)

        # residual resample at the first rejection: r ∝ max(q - p, 0)
        idx = jnp.minimum(n_acc, kk - 2)
        q_rej = jnp.exp(lp_t[idx])
        p_rej = jnp.exp(lp_d_mat[idx])
        resid = jnp.maximum(q_rej - p_rej, 0.0)
        resid_ok = jnp.sum(resid) > 0
        resid_logits = jnp.where(
            resid_ok, jnp.log(jnp.maximum(resid, 1e-30)), lp_t[idx])
        if not gen.do_sample:
            resid_logits = lp_t[idx]   # greedy correction = target argmax
        rng, sub = jax.random.split(rng)
        t_resample = draw(sub, resid_logits[None])[0]
        # bonus token from the last target dist when every draft accepted
        rng, sub = jax.random.split(rng)
        t_bonus = draw(sub, lp_t[kk - 1][None])[0]
        t_star = jnp.where(all_acc, t_bonus, t_resample)

        # ---- emit [d_0..d_{n_acc-1}, t_star], honoring stop + cap ----
        emitted = jnp.concatenate([d_vec, t_star[None]])   # (kk,)
        emitted = jnp.where(jnp.arange(kk) == n_acc, t_star, emitted)
        count0 = n_acc + 1                                 # <= kk
        # stop token inside the emission truncates it
        is_stop = (emitted == eos) & (jnp.arange(kk) < count0)
        any_stop = jnp.any(is_stop)
        first_stop = jnp.argmax(is_stop)
        count = jnp.where(any_stop, first_stop + 1, count0)
        count = jnp.minimum(count, max_new - s.step)       # cap at max_new
        count = jnp.where(s.finished[0], 0, count)

        keep = jnp.arange(kk) < count
        # codes: write the kept window at s.step (masked merge)
        window = jax.lax.dynamic_slice(
            jnp.pad(s.codes[0], (0, kk)), (s.step,), (kk,))
        merged = jnp.where(keep, emitted, window)
        codes = jax.lax.dynamic_update_slice(
            jnp.pad(s.codes[0], (0, kk)), merged, (s.step,))[None, :max_new]
        # presence: checkpoint at the emission boundary + t_star's bit
        pres_stack = jnp.stack([c[0] for c in p_ckpts])    # (kk, V)
        presence = pres_stack[jnp.minimum(n_acc, kk - 1)][None]
        presence = jnp.where(
            (jnp.arange(vocab) == t_star)[None] & keep[jnp.minimum(
                count - 1, kk - 1)], True, presence)
        token = jnp.where(count > 0,
                          merged[jnp.minimum(count - 1, kk - 1)],
                          s.token[0])[None]
        newly_finished = any_stop & (count == first_stop + 1) & (count > 0)
        finished = s.finished | newly_finished[None]
        lengths = jnp.where(s.finished, s.lengths, s.step + count)
        return _SpecState(s.step + count, token, cache, presence, codes,
                          finished, lengths, rng)

    init = _SpecState(jnp.asarray(1), token0, cache, presence, codes,
                      finished0, lengths0, rng)
    final = jax.lax.while_loop(cond_fn, body_fn, init)
    hit_limit = ~final.finished
    return DecodeResult(final.codes, final.lengths, hit_limit)
