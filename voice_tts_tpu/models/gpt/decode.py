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
from voice_tts_tpu.models.gpt.unified_voice import UnifiedVoice
from voice_tts_tpu.ops.fused_decode import (FusedDecodePack, apply_kv_update,
                                            apply_kv_update_batch,
                                            apply_kv_update_q,
                                            apply_kv_update_q_batch,
                                            cache_to_time_major,
                                            fused_decode_step,
                                            fused_decode_step_batch,
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
           fused_batch: bool = False) -> DecodeResult:
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
    p = cfg.condition_num_latent + 2 + bl + 2  # conds(34) + start/text/stop
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
            hidden, kv_new = fused_decode_step_batch(
                emb, fused_pack, kv_c, attn_bias, p + s.step, cfg.heads,
                interpret=interp, kv_scales=kv_s, int4_expand=int4_expand,
                merge_stages=merge_stages)
            if int8_kv:
                cache = apply_kv_update_q_batch(kv_c, kv_s, kv_new,
                                                p + s.step)
            else:
                cache = apply_kv_update_batch(s.cache, kv_new, p + s.step)
            logits = model.apply(params, hidden, method=UnifiedVoice.readout)
        elif use_fused:
            emb = model.apply(params, s.token, s.step - 1,
                              method=UnifiedVoice.embed_decode_token)
            kv_c, kv_s = s.cache if int8_kv else (s.cache, None)
            hidden, kv_new = fused_decode_step(
                emb, fused_pack, kv_c, attn_bias, p + s.step, cfg.heads,
                interpret=interp, kv_scales=kv_s, int4_expand=int4_expand,
                merge_stages=merge_stages)
            if int8_kv:
                cache = apply_kv_update_q(kv_c, kv_s, kv_new, p + s.step)
            else:
                cache = apply_kv_update(s.cache, kv_new, p + s.step)
            logits = model.apply(params, hidden, method=UnifiedVoice.readout)
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
