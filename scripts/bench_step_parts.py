"""Marginal per-token cost of each decode-step component at flagship shape.

Mirrors `models.gpt.decode.body_fn` (fused megakernel path) in a fori_loop
(no early exit) and toggles components: trunk only, +embed/readout,
+sampling, +bookkeeping.  Difference-of-iteration-counts timing cancels the
fixed dispatch/transfer overhead of the remote-attached chip.

Run in the foreground on the TPU host:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_step_parts.py
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp

from voice_tts_tpu.config import GPTConfig, GenerationConfig
from voice_tts_tpu.models.gpt import UnifiedVoice
from voice_tts_tpu.models.gpt.decode import sample_token
from voice_tts_tpu.ops.fused_decode import (apply_kv_update, fused_decode_step,
                                            pack_gpt)
from voice_tts_tpu.utils.quantize import quantize_gpt_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=64)
    ap.add_argument("--hi", type=int, default=256)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("backend:", jax.default_backend())

    cfg = GPTConfig()
    model = UnifiedVoice(cfg)

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
                           num_beams=1)
    cache0 = (jax.random.normal(jax.random.PRNGKey(2),
                                (cfg.layers, 2, 1, t_max, d), jnp.float32)
              * 0.02).astype(jnp.bfloat16)
    bias = jnp.zeros((t_max, 1), jnp.float32)

    def make(mode):
        @functools.partial(jax.jit, static_argnames=("n",))
        def many(qparams, pack, tok0, cache, rng, n):
            pres0 = jnp.zeros((1, v), dtype=bool).at[:, 1].set(True)

            def body(i, carry):
                tok, cache, pres, rng = carry
                emb = model.apply(qparams, tok, i,
                                  method=UnifiedVoice.embed_decode_token)
                hidden, kv_new = fused_decode_step(emb, pack, cache, bias,
                                                   p + 1 + i, cfg.heads)
                if mode == "trunk":
                    tok = (jnp.sum(hidden) * 0).astype(jnp.int32)[None] + tok
                    return tok, cache, pres, rng
                cache = apply_kv_update(cache, kv_new, p + 1 + i)
                logits = model.apply(qparams, hidden,
                                     method=UnifiedVoice.readout)
                if mode == "readout":
                    tok = jnp.argmax(logits, -1).astype(jnp.int32) % 8192
                    return tok, cache, pres, rng
                rng, sub = jax.random.split(rng)
                tok = sample_token(logits, pres, gen, sub) % 8192
                if mode == "sample":
                    return tok, cache, pres, rng
                pres = pres.at[jnp.arange(1), tok].set(True)   # bookkeeping
                return tok, cache, pres, rng

            tok, cache, pres, rng = jax.lax.fori_loop(
                0, n, body, (tok0, cache, pres0, rng))
            return tok[0] + jnp.sum(cache[0, 0, 0, 0, :8])
        return many

    for mode in ("trunk", "readout", "sample", "full"):
        many = make(mode)
        lo, hi = args.lo, args.hi
        tok0 = jnp.asarray([5], jnp.int32)
        float(many(qparams, pack, tok0, cache0, jax.random.PRNGKey(1), lo))
        float(many(qparams, pack, tok0, cache0, jax.random.PRNGKey(1), hi))
        def t(n, s):
            t0 = time.perf_counter()
            float(many(qparams, pack, tok0 + s % 2, cache0 + s * 1e-6,
                       jax.random.PRNGKey(s), n))
            return time.perf_counter() - t0
        tlo = min(t(lo, 1 + i) for i in range(3))
        thi = min(t(hi, 10 + i) for i in range(3))
        print(f"{mode:8s} {(thi - tlo) / (hi - lo) * 1e3:7.3f} ms/token")


if __name__ == "__main__":
    main()
