"""Full AR decode-loop microbench at flagship GPT shape (L24/D1280/H20).

Measures ms/token of `models.gpt.decode` end-to-end (trunk + embed/readout +
sampling + bookkeeping) for variants, isolating where the per-step time goes:

    fused+sample   engine default (megakernel trunk, top-k/top-p sampling)
    fused+greedy   megakernel trunk, argmax (no warpers)
    xla+sample     XLA int8 trunk (ops/int8_matmul GEMV)

Run in the foreground on the TPU host:
    python scripts/bench_decode_loop.py --max-new 256
"""

import argparse
import time

import jax
import jax.numpy as jnp

from voice_tts_tpu.config import GPTConfig, GenerationConfig
from voice_tts_tpu.models.gpt import UnifiedVoice
from voice_tts_tpu.models.gpt.decode import decode
from voice_tts_tpu.ops.fused_decode import pack_gpt
from voice_tts_tpu.utils.quantize import quantize_gpt_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--text-bucket", type=int, default=48)
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

    t0 = time.perf_counter()
    params = init(jax.random.PRNGKey(0))
    qparams = quantize_gpt_params(params)
    pack = pack_gpt(qparams, cfg.layers)
    jax.block_until_ready(pack.w)
    print(f"init+quantize+pack: {time.perf_counter() - t0:.1f} s")

    bl = args.text_bucket
    cond = jax.random.normal(jax.random.PRNGKey(1),
                             (1, cfg.condition_num_latent, cfg.model_dim),
                             jnp.bfloat16)
    emo = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.model_dim),
                            jnp.bfloat16)
    text = jnp.zeros((1, bl), jnp.int32).at[0, :20].set(
        jnp.arange(20) % 100 + 10)
    tlen = jnp.asarray([20])
    rng = jax.random.PRNGKey(3)

    sample = GenerationConfig(do_sample=True, top_p=0.8, top_k=30,
                              temperature=0.8, repetition_penalty=10.0,
                              num_beams=1)
    greedy = GenerationConfig(do_sample=False, num_beams=1,
                              repetition_penalty=10.0)
    greedy_norep = GenerationConfig(do_sample=False, num_beams=1,
                                    repetition_penalty=1.0)

    def run(label, gen, fused):
        fp = pack if fused else None
        res = decode(qparams, model, gen, cond, emo, text, tlen, rng,
                     max_new=args.max_new, fused_pack=fp)
        jax.block_until_ready(res.codes)   # compile
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            res = decode(qparams, model, gen, cond, emo, text, tlen,
                         jax.random.PRNGKey(10 + i), max_new=args.max_new,
                         fused_pack=fp)
            jax.block_until_ready(res.codes)
            times.append(time.perf_counter() - t0)
        best = min(times)
        n = int(res.lengths[0]) or args.max_new
        # decode always runs max_new steps unless every row finished early;
        # report per-step over the steps actually executed
        steps = args.max_new if bool(res.hit_limit[0]) else int(res.lengths[0])
        steps = max(steps, 1)
        print(f"{label:16s} {best * 1e3:7.1f} ms total, "
              f"{best / steps * 1e3:6.3f} ms/token ({steps} steps)")

    run("fused+sample", sample, True)
    run("fused+greedy", greedy, True)
    run("fused+greedy-rp", greedy_norep, True)
    run("xla+sample", sample, False)


if __name__ == "__main__":
    main()
