"""Marginal per-token cost of each BEAM decode-step component (K=3 fused).

Mirrors `models.gpt.beam.beam_decode`'s body_fn (batched megakernel path)
in a fori_loop with component toggles: trunk only, +readout, +candidates
(softmax + warpers + Gumbel top-k), +full scorer/state step.  VERDICT r4
item 4: beam-3 sits 1.75x over greedy — this decomposes where the extra
~1 ms/step lives.  Difference-of-iteration-counts timing cancels fixed
dispatch overhead (see bench_step_parts.py).

Run on the TPU host:
    python scripts/prof_beam_parts.py [--legacy]

--legacy forces the full-vocab argsort candidates pipeline (the pre-r4
implementation) for the A/B against the candidate-space rewrite.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from voice_tts_tpu.config import GPTConfig, GenerationConfig
from voice_tts_tpu.models.gpt import UnifiedVoice
from voice_tts_tpu.models.gpt.beam import (NEG, _process_scores,
                                           warp_candidate_space)
from voice_tts_tpu.models.gpt.decode import apply_repetition_penalty
from voice_tts_tpu.ops.fused_decode import (apply_kv_update_batch,
                                            fused_decode_step_batch, pack_gpt)
from voice_tts_tpu.utils.quantize import quantize_gpt_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=64)
    ap.add_argument("--hi", type=int, default=256)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--legacy", action="store_true",
                    help="full-vocab argsort candidates (pre-r4 pipeline)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("backend:", jax.default_backend(), "legacy:", args.legacy)

    cfg = GPTConfig()
    model = UnifiedVoice(cfg)
    k = args.k

    @jax.jit
    def init(key):
        return model.init(
            key, jnp.zeros((1, 6, 1024)), jnp.zeros((1, 6, 1024)),
            jnp.zeros((1, 5), dtype=jnp.int32), jnp.asarray([5]),
            jnp.zeros((1, 7), dtype=jnp.int32), jnp.asarray([7]),
            method=UnifiedVoice.init_all)

    params = init(jax.random.PRNGKey(0))
    qparams = quantize_gpt_params(params)
    pack = pack_gpt(qparams, cfg.layers)
    jax.block_until_ready(pack.w)

    d, v = cfg.model_dim, cfg.number_mel_codes
    t_max, p = 512, 84
    gen = GenerationConfig(do_sample=True, top_p=0.8, top_k=30,
                           temperature=0.8, repetition_penalty=10.0,
                           num_beams=k)
    cache0 = (jax.random.normal(jax.random.PRNGKey(2),
                                (cfg.layers, 2, k, t_max, d), jnp.float32)
              * 0.02).astype(jnp.bfloat16)
    bias = jnp.zeros((k, t_max), jnp.float32)
    src0 = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[:, None],
                            (k, t_max))

    def candidates(logits, presence, beam_scores, rng):
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        n_keep = 2 * k
        if args.legacy:
            processed = _process_scores(logprobs, presence, gen)
            scores = processed + beam_scores[:, None]
            flat = scores.reshape(-1)
            flat_lp = jax.nn.log_softmax(flat)
            g = flat_lp - jnp.log(-jnp.log(jax.random.uniform(
                rng, flat.shape, minval=1e-20, maxval=1.0)))
            _, idx = jax.lax.top_k(g, n_keep)
            cand_scores = flat[idx]
            order = jnp.argsort(-cand_scores)
            return cand_scores[order], idx[order] // v, idx[order] % v
        s = apply_repetition_penalty(logprobs, presence,
                                     gen.repetition_penalty)
        s = s / gen.temperature
        top_vals, top_idx = warp_candidate_space(s, gen.top_k, gen.top_p,
                                                 n_keep)
        cand = top_vals + beam_scores[:, None]
        nk = top_vals.shape[-1]
        flat = cand.reshape(-1)
        flat_lp = jax.nn.log_softmax(flat)
        g = flat_lp - jnp.log(-jnp.log(jax.random.uniform(
            rng, flat.shape, minval=1e-20, maxval=1.0)))
        _, idx = jax.lax.top_k(g, n_keep)
        cand_scores = flat[idx]
        order = jnp.argsort(-cand_scores)
        idx = idx[order]
        return cand_scores[order], idx // nk, top_idx[idx // nk, idx % nk]

    def make(mode):
        @functools.partial(jax.jit, static_argnames=("n",))
        def many(qparams, pack, cache, rng, n):
            pres0 = jnp.zeros((k, v), dtype=bool).at[:, 1].set(True)
            scores0 = jnp.full((k,), NEG, jnp.float32).at[0].set(0.0)
            toks0 = jnp.full((k,), 5, jnp.int32)
            hist0 = jnp.zeros((k, 256), jnp.int32)

            def body(i, carry):
                toks, cache, src, pres, scores, hist, rng = carry
                emb = model.apply(qparams, toks, i,
                                  method=UnifiedVoice.embed_decode_token)
                hidden, kv_new = fused_decode_step_batch(
                    emb, pack, cache, bias, p + 1 + i, cfg.heads,
                    beam_src=src)
                if mode == "trunk":
                    toks = (jnp.sum(hidden) * 0).astype(jnp.int32) + toks
                    return toks, cache, src, pres, scores, hist, rng
                cache = apply_kv_update_batch(cache, kv_new, p + 1 + i)
                logits = model.apply(qparams, hidden,
                                     method=UnifiedVoice.readout)
                if mode == "readout":
                    toks = jnp.argmax(logits, -1).astype(jnp.int32) % 8192
                    return toks, cache, src, pres, scores, hist, rng
                rng, sub = jax.random.split(rng)
                cand_scores, cand_beams, cand_tokens = candidates(
                    logits, pres, scores, sub)
                if mode == "cand":
                    toks = cand_tokens[:k] % 8192
                    return toks, cache, src, pres, scores, hist, rng
                # full state step: next beams = first K candidates (the
                # scorer's gather/update pattern without the eos logic)
                sel = jnp.arange(k)
                nb, toks = cand_beams[sel], cand_tokens[sel] % 8192
                scores = cand_scores[sel]
                hist = hist[nb]
                hist = jax.lax.dynamic_update_slice(
                    hist, toks[:, None], (0, i % 200))
                pres = pres[nb].at[jnp.arange(k), toks].set(True)
                src = jax.lax.dynamic_update_slice(
                    src, jnp.arange(k, dtype=jnp.int32)[:, None],
                    (0, p + 1 + i))[nb]
                return toks, cache, src, pres, scores, hist, rng

            carry = (toks0, cache, src0, pres0, scores0, hist0, rng)
            carry = jax.lax.fori_loop(0, n, body, carry)
            return carry[0][0] + jnp.sum(carry[1][0, 0, 0, 0, :8])
        return many

    for mode in ("trunk", "readout", "cand", "full"):
        many = make(mode)
        lo, hi = args.lo, args.hi
        float(many(qparams, pack, cache0, jax.random.PRNGKey(1), lo))
        float(many(qparams, pack, cache0, jax.random.PRNGKey(1), hi))

        def t(n, s):
            t0 = time.perf_counter()
            float(many(qparams, pack, cache0 + s * 1e-6,
                       jax.random.PRNGKey(s), n))
            return time.perf_counter() - t0
        tlo = min(t(lo, 1 + i) for i in range(3))
        thi = min(t(hi, 10 + i) for i in range(3))
        print(f"{mode:8s} {(thi - tlo) / (hi - lo) * 1e3:7.3f} ms/token",
              flush=True)


if __name__ == "__main__":
    main()
