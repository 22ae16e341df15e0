"""Dissect post-decode synthesis time at bench shapes.

Builds the bench engine, then times the jitted stage graphs directly:
latent / s2mel (at several diffusion step counts) / vocoder / fused chain.
K sequential async dispatches with one final sync separate device time from
the per-call dispatch+sync overhead of the remote-attached chip.

Run in the foreground on the TPU host:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_synth.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_engine  # noqa: E402


def timed_chain(fn, args, k=8, reps=3):
    """Device-time per call: k async dispatches, one sync."""
    outs = fn(*args)
    jax.block_until_ready(outs)            # compile
    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        for i in range(k):
            outs = fn(*args)
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def main():
    print("backend:", jax.default_backend())
    eng = build_engine(False)
    cfg = eng.cfg

    cbucket, tbucket = 256, 48
    mbucket = eng._mel_bucket_for(cbucket)
    pbuckets = tuple(b for b in cfg.engine.prompt_frame_buckets
                     if b < eng.prompt_mel_frames) + (eng.prompt_mel_frames,)
    pbucket = pbuckets[0] if pbuckets else eng.prompt_mel_frames
    print(f"buckets: code={cbucket} mel={mbucket} prompt={pbucket}")

    rng = jax.random.PRNGKey(0)
    d = cfg.gpt.model_dim
    cond = jax.random.normal(rng, (1, cfg.gpt.condition_num_latent, d),
                             jnp.bfloat16)
    emo = jax.random.normal(rng, (1, d), jnp.bfloat16)
    text = jnp.zeros((1, tbucket), jnp.int32)
    tlen = jnp.asarray([20])
    codes = jnp.zeros((1, cbucket), jnp.int32)
    clen = jnp.asarray([200])
    pc = jax.random.normal(rng, (1, pbucket, cfg.s2mel.dit.content_dim),
                           jnp.float32) * 0.1
    plen = jnp.asarray([pbucket])
    ref_mel = jax.random.normal(rng, (1, 80, pbucket), jnp.float32)
    style = jax.random.normal(rng, (1, 192), jnp.float32) * 0.1

    t = timed_chain(eng._gpt_latent,
                    (eng.params_gpt_rt, cond, emo, text, tlen, codes, clen))
    print(f"latent:        {t*1e3:7.1f} ms/call")

    for steps in (25, 5, 1):
        eng.cfg.engine.diffusion_steps = steps
        eng._build_jit_fns()
        t = timed_chain(eng._s2mel_chain,
                        (eng.params_s2mel_rt, eng.params["repcodec"],
                         jnp.zeros((1, cbucket, 1280), jnp.float32),
                         codes, clen, pc, plen, ref_mel, style,
                         jax.random.PRNGKey(1), cbucket, mbucket))
        print(f"s2mel({steps:2d}):    {t*1e3:7.1f} ms/call")

    mel = jax.random.normal(rng, (1, 80, mbucket), jnp.float32)
    t = timed_chain(eng._vocode, (eng.params["vocoder"], mel))
    print(f"vocoder:       {t*1e3:7.1f} ms/call")

    eng.cfg.engine.diffusion_steps = 25
    eng._build_jit_fns()
    t = timed_chain(eng._synth_chain,
                    (eng.params_gpt_rt, eng.params_s2mel_rt,
                     eng.params["repcodec"], eng.params["vocoder"],
                     cond, emo, text, tlen, codes, clen, pc, plen, ref_mel,
                     style, jax.random.PRNGKey(1), cbucket, mbucket))
    print(f"fused chain:   {t*1e3:7.1f} ms/call")


if __name__ == "__main__":
    main()
