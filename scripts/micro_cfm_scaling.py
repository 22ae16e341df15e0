"""Scaling probe for the DiT velocity eval: where do the 2.1 ms/step go?

Sweeps sequence length T, CFG batch B, and trunk depth for the flagship DiT
(512 hidden, 13 blocks, fp32 params).  Interpretation:
  - time ~ linear in T and depth  -> HBM-traffic / compute bound
    (a head-packed whole-trunk Pallas kernel could pay off; weights+activation
    DMA floor at T=704/B=2 is ~0.3-0.6 ms vs 2.23 ms measured)
  - time ~ flat in T at small T   -> per-op fixed overhead dominates
    (kernel fusion attacks the op COUNT, not bytes — different design)

Chained fori_loop difference timing (axon dedupes independent dispatches).
Run in the foreground:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_cfm_scaling.py
"""

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from voice_tts_tpu.config import TTSConfig  # noqa: E402
from voice_tts_tpu.models.s2mel.dit import DiT  # noqa: E402


def chained_ms(loop, w, x, lo=2, hi=8, reps=3):
    float(loop(w, x, lo))
    float(loop(w, x, hi))

    def t(n, s):
        t0 = time.perf_counter()
        float(loop(w, x + s * 1e-6, n))
        return time.perf_counter() - t0

    tlo = min(t(lo, 1 + i) for i in range(reps))
    thi = min(t(hi, 10 + i) for i in range(reps))
    return (thi - tlo) / (hi - lo) * 1e3


def measure(dcfg, wn_cfg, b, t_frames, key):
    model = DiT(dcfg, wn_cfg)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (b, 80, t_frames), jnp.float32)
    prompt = jax.random.normal(ks[1], (b, 80, t_frames), jnp.float32) * 0.1
    style = jax.random.normal(ks[2], (b, 192), jnp.float32)
    cond = jax.random.normal(ks[3], (b, t_frames, dcfg.hidden_dim),
                             jnp.float32)
    lens = jnp.full((b,), t_frames, jnp.int32)
    tt = jnp.full((b,), 0.4, jnp.float32)

    @jax.jit
    def init(k):
        return model.init(k, x, prompt, lens, tt, style, cond)

    params = init(ks[4])

    @functools.partial(jax.jit, static_argnames=("n",))
    def vel_loop(p, xx, n):
        def body(i, acc):
            v = model.apply(p, xx + acc * 1e-9, prompt, lens,
                            tt + i * 1e-6, style, cond)
            return acc + jnp.sum(v) * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return chained_ms(vel_loop, params, x)


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = TTSConfig()
    base = cfg.s2mel.dit
    key = jax.random.PRNGKey(0)

    print("-- T sweep (B=2, depth=13) --", flush=True)
    for t_frames in (176, 352, 704, 1408):
        ms = measure(base, cfg.s2mel.wavenet, 2, t_frames, key)
        print(f"T={t_frames:5d}: {ms:7.2f} ms", flush=True)

    print("-- depth sweep (B=2, T=704) --", flush=True)
    for depth in (4, 8, 13):
        dcfg = dataclasses.replace(base, depth=depth)
        ms = measure(dcfg, cfg.s2mel.wavenet, 2, 704, key)
        print(f"depth={depth:3d}: {ms:7.2f} ms", flush=True)

    print("-- B sweep (depth=13, T=704) --", flush=True)
    for b in (2, 4, 8):
        ms = measure(base, cfg.s2mel.wavenet, b, 704, key)
        print(f"B={b}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
