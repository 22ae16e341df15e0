"""Decompose the fused-pipeline wall time at bench shape.

Separates (a) on-device compute per call (chained fori-style difference),
(b) single-call wall time incl. the int16 fetch, (c) the fetch alone.
The gap (b) - (a) - (c) is dispatch/RTT overhead of the remote chip.

Run in the foreground on the TPU host:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_overhead.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_engine  # noqa: E402
from voice_tts_tpu.audio import encode_wav_int16  # noqa: E402
from voice_tts_tpu.engine import post  # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    eng = build_engine(False)
    cfg = eng.cfg

    sr = 22050
    t = np.arange(5 * sr) / sr
    tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    prompt = encode_wav_int16(tone * 32767, sr)
    text = "今天天气真好我们一起出去散步聊天吧."

    # warm (compiles the pipeline for the buckets)
    eng.infer(prompt, text, None)

    # mirror _synthesize_segment's argument assembly
    spk, emovec, segments = eng._prepare(prompt, None, 1.0, None, False,
                                         None, False, text, 120)
    seg = segments[0]
    ids = eng.tokenizer.convert_tokens_to_ids(seg)
    text_len = len(ids)
    bucket = post.pick_bucket(text_len, cfg.engine.text_buckets)
    text_arr = np.zeros((1, bucket), np.int32)
    text_arr[0, :text_len] = ids[:bucket]
    gen = eng._generation_config({})
    cbucket = post.pick_bucket(gen.max_mel_tokens, eng._code_buckets())
    pbuckets = tuple(b for b in cfg.engine.prompt_frame_buckets
                     if b < eng.prompt_mel_frames) + (eng.prompt_mel_frames,)
    pbucket = post.pick_bucket(spk["mel_frames"], pbuckets)
    rng = jnp.stack([jax.random.PRNGKey(1)[:], jax.random.PRNGKey(2)[:]])

    base_args = dict(
        text=jnp.asarray(text_arr), tlen=jnp.asarray([min(text_len, bucket)]),
        pc=spk["prompt_condition"][:, :pbucket],
        plen=jnp.asarray([spk["mel_frames"]]),
        ref=spk["ref_mel"][:, :, :pbucket], style=spk["style"])

    def call(emo, rng):
        return eng._segment_pipeline(
            eng.params_gpt_rt, (eng.fused_pack, eng.spec_draft_pack,
                                eng.readout_pack),
            eng.params_s2mel_rt,
            eng.params["repcodec"], eng.params_voc_rt,
            spk["cond_latents"], emo, base_args["text"], base_args["tlen"],
            base_args["pc"], base_args["plen"], base_args["ref"],
            base_args["style"], rng, gen, cbucket,
            eng._mel_bucket_for(cbucket), min(cbucket, gen.max_mel_tokens))

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(emo, rng, n):
        def body(i, carry):
            emo, acc = carry
            out = call(emo, rng + i)
            s = jnp.sum(out[:, -1].astype(jnp.float32)) * 1e-9
            return emo + s, acc + s
        _, acc = jax.lax.fori_loop(0, n, body, (emo, jnp.float32(0.0)))
        return acc

    float(chain(emovec, rng, 1))
    float(chain(emovec, rng, 3))

    def tc(n, s):
        t0 = time.perf_counter()
        float(chain(emovec + s * 1e-6, rng + s, n))
        return time.perf_counter() - t0

    t1 = min(tc(1, 1 + i) for i in range(3))
    t3 = min(tc(3, 10 + i) for i in range(3))
    dev_ms = (t3 - t1) / 2 * 1e3
    print(f"device compute / call:   {dev_ms:7.1f} ms", flush=True)

    # single-call wall (dispatch + compute + fetch), as the engine does it
    out = call(emovec, rng)
    _ = np.asarray(out)
    walls = []
    for i in range(4):
        t0 = time.perf_counter()
        out = call(emovec + (3 + i) * 1e-6, rng + 77 + i)
        arr = np.asarray(out)
        walls.append(time.perf_counter() - t0)
    wall_ms = min(walls) * 1e3
    print(f"wall / call (w/ fetch):  {wall_ms:7.1f} ms", flush=True)

    # fetch alone: device->host of the (449, 256) int16 buffer
    fetches = []
    for i in range(4):
        out = call(emovec + (9 + i) * 1e-6, rng + 177 + i)
        _ = float(jnp.sum(out[:, -1].astype(jnp.float32)))  # force completion
        t0 = time.perf_counter()
        arr = np.asarray(out)
        fetches.append(time.perf_counter() - t0)
    fetch_ms = min(fetches) * 1e3
    nbytes = int(np.prod(out.shape)) * 2
    print(f"fetch alone ({nbytes/1024:.0f} KiB):   {fetch_ms:7.1f} ms",
          flush=True)
    print(f"=> dispatch/RTT overhead: {wall_ms - dev_ms - fetch_ms:7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
