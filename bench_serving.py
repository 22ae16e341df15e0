"""Served-workload benchmark: concurrent /tts requests with continuous
batching (BASELINE config #5: 16 concurrent mixed-length requests).

Prints ONE JSON line with p50 latency and aggregate throughput.  Not the
driver's primary bench (that's bench.py); run manually:

    python bench_serving.py [--concurrency 16] [--requests 32] [--tiny]
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--concurrency", type=int, default=16)
    parser.add_argument("--requests", type=int, default=32)
    parser.add_argument("--arrival-rate", type=float, default=0.0,
                        help="mean request arrivals per second (Poisson; "
                        "0 = all at once).  Staggered arrivals are the "
                        "workload continuous batching is FOR — a request "
                        "joins the running decode batch instead of waiting "
                        "out the current group")
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--unique-speakers", action="store_true",
                        help="every request brings a DISTINCT speaker "
                             "prompt (conditioning cache-miss per request "
                             "— the fleet-realistic workload; the default "
                             "cycles 3 prompts so most requests hit the "
                             "cache)")
    args = parser.parse_args()

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from voice_tts_tpu.audio import encode_wav_int16
    from bench import build_engine

    engine = build_engine(args.tiny)
    engine.cfg.server.max_batch_size = min(8, args.concurrency)

    sr = 22050
    rng = np.random.default_rng(0)
    prompts = []
    for sec in (3.0, 5.0, 8.0):
        t = np.arange(int(sec * sr)) / sr
        tone = (0.4 * np.sin(2 * np.pi * rng.uniform(180, 320) * t)).astype(np.float32)
        prompts.append(encode_wav_int16(tone * 32767, sr))
    texts = ["今天天气真好我们一起出去散步聊天吧.",
             "欢迎体验这个全新的语音合成系统谢谢.",
             "这是一个比较长的句子用来测试不同长度的请求情况如何."]

    # warm-up: compile decode/s2mel graphs for batch buckets
    warm_uid = [10_000]  # distinct from the measured unique prompts

    def warm_prompt(i):
        if not args.unique_speakers:
            return prompts[i % 3]
        from bench import _unique_prompt
        warm_uid[0] += 1
        return _unique_prompt(warm_uid[0])

    for b in (1, 2, 4, 8):
        if b > engine.cfg.server.max_batch_size:
            break
        # unique-speaker mode: b NEW speakers per group so the batched
        # conditioning graph compiles at every bucket (a mid-bench compile
        # of the flagship conditioning graph costs ~a minute on the tunnel
        # and poisons every latency percentile)
        reqs = [{"spk_audio_prompt": warm_prompt(i), "text": texts[i % 3]}
                for i in range(b)]
        engine.infer_batch(reqs)

    latencies = []
    lock = threading.Lock()
    sem = threading.Semaphore(args.concurrency)
    pending = []
    audio_total = [0.0]

    # CONT_BATCH=1: slot-based continuous batching (requests join a running
    # decode batch mid-flight); default: grouped infer_batch through a
    # software batcher mimicking the server
    continuous = os.environ.get("CONT_BATCH", "0") == "1"
    cont_batcher = None
    if continuous:
        from voice_tts_tpu.engine.continuous import ContinuousBatcher

        cont_batcher = ContinuousBatcher(
            engine, chunk_steps=int(os.environ.get("CHUNK_STEPS", "16")))
        # warm-up: compile admit buckets + the chunk graph
        h, ev = cont_batcher.submit(
            {"spk_audio_prompt": prompts[0], "text": texts[0]})
        h2, ev2 = cont_batcher.submit(
            {"spk_audio_prompt": prompts[1], "text": texts[2]})
        cont_batcher.run()
        assert ev.is_set() and ev2.is_set()
        cont_batcher.start()

    batch_lock = threading.Lock()
    queue = []
    done = threading.Event()

    def batcher():
        while not done.is_set() or queue:
            with batch_lock:
                batch, queue[:] = queue[:engine.cfg.server.max_batch_size], \
                    queue[engine.cfg.server.max_batch_size:]
            if not batch:
                time.sleep(0.005)
                continue
            reqs = [b[1] for b in batch]
            results = engine.infer_batch(reqs)
            for (ev, _, holder), res in zip(batch, results):
                holder.append(res)
                ev.set()

    if not continuous:
        worker = threading.Thread(target=batcher, daemon=True)
        worker.start()

    unique_prompts = None
    if args.unique_speakers:
        from bench import _unique_prompt

        unique_prompts = [_unique_prompt(i) for i in range(args.requests)]

    def one_request(i):
        spk = (unique_prompts[i] if unique_prompts is not None
               else prompts[i % 3])
        req = {"spk_audio_prompt": spk, "text": texts[i % 3]}
        t0 = time.perf_counter()
        if continuous:
            holder, ev = cont_batcher.submit(req)
        else:
            holder = []
            ev = threading.Event()
            with batch_lock:
                queue.append((ev, req, holder))
        ev.wait()
        if isinstance(holder[0], Exception):
            raise holder[0]
        dt = time.perf_counter() - t0
        with lock:
            latencies.append(dt)
            audio_total[0] += holder[0].metrics["audio_length"]
        sem.release()

    arrival_rng = np.random.default_rng(7)
    t_start = time.perf_counter()
    threads = []
    for i in range(args.requests):
        if args.arrival_rate > 0:
            time.sleep(float(arrival_rng.exponential(1.0 / args.arrival_rate)))
        sem.acquire()
        th = threading.Thread(target=one_request, args=(i,))
        th.start()
        threads.append(th)
    for th in threads:
        th.join()
    done.set()
    if cont_batcher is not None:
        cont_batcher.stop()
    wall = time.perf_counter() - t_start

    lat = np.asarray(sorted(latencies))
    result = {
        "metric": "served_p50_latency_16cc",
        "value": round(float(np.percentile(lat, 50)), 4),
        "unit": "s",
        "vs_baseline": 0.0,
        "detail": {
            "p90_s": round(float(np.percentile(lat, 90)), 4),
            "requests": args.requests,
            "concurrency": args.concurrency,
            "wall_s": round(wall, 3),
            "audio_seconds": round(audio_total[0], 2),
            "aggregate_rtf": round(wall / max(audio_total[0], 1e-9), 4),
            "unique_speakers": bool(args.unique_speakers),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
