"""Server-entry-point benchmark: measure what `serving/app.py` ACTUALLY
serves, with no env vars (VERDICT r4 item 1's done-criterion: the round-3
bench winners were unreachable from the server because every fast-path flag
lived in bench.py env vars).

Starts `python -m voice_tts_tpu.serving.app` as a subprocess (flagship-dims
random weights via the default profile path — pass --model-dir to use real
artifacts), waits for /health, then drives the HTTP surface:

  1. single-request latency at the SERVER's default generation config
     (num_beams=3, the reference default) — sequential requests, median RTF;
  2. a c16/32-request concurrent burst — p50 latency + aggregate RTF.

Prints ONE JSON line per phase.  Run on the TPU host:
    python scripts/bench_server_e2e.py [--model-dir DIR] [--port 8031]
"""

import argparse
import http.client
import json
import os
import socket
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def wait_port(port: int, deadline_s: float) -> bool:
    t0 = time.time()
    while time.time() - t0 < deadline_s:
        s = socket.socket()
        try:
            if s.connect_ex(("127.0.0.1", port)) == 0:
                return True
        finally:
            s.close()
        time.sleep(2.0)
    return False


def post_tts(port: int, payload: dict, timeout: float = 1200.0) -> dict:
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", "/tts", body=json.dumps(payload),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    body = resp.read().decode()
    conn.close()
    if resp.status != 200:
        raise RuntimeError(f"/tts {resp.status}: {body[:300]}")
    return json.loads(body)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--port", type=int, default=8031)
    ap.add_argument("--profile", default="serving")
    ap.add_argument("--concurrency", type=int, default=16)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--single-repeats", type=int, default=5)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random engine on CPU (smoke test)")
    ap.add_argument("--server-log", default=None,
                    help="capture the server subprocess's stdout/stderr "
                         "(per-request engine timer lines) to this file — "
                         "the raw material for the server-vs-engine "
                         "single-request gap decomposition")
    args = ap.parse_args()

    from voice_tts_tpu.audio import encode_wav_int16

    sr = 22050
    t = np.arange(5 * sr) / sr
    tone = (0.4 * np.sin(2 * np.pi * 220 * t)
            + 0.1 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    prompt_hex = encode_wav_int16(tone * 32767, sr).hex()
    texts = ["今天天气真好我们一起出去散步聊天吧.",
             "欢迎体验这个全新的语音合成系统谢谢.",
             "这是一个比较长的句子用来测试不同长度的请求情况如何."]

    cmd = [sys.executable, "-m", "voice_tts_tpu.serving.app",
           "--port", str(args.port), "--profile", args.profile]
    if args.model_dir:
        cmd += ["--model-dir", args.model_dir]
    if args.tiny:
        cmd += ["--tiny", "--platform", "cpu"]
    env = dict(os.environ)
    # NO bench env vars: the point is to measure the server's own defaults
    for k in ("INT8_DECODE", "FUSED_DECODE", "FUSED_BEAM", "FUSED_BATCH",
              "INT8_KV", "BEAMS", "FOLD_READOUT", "COND_BF16"):
        env.pop(k, None)
    log_f = (open(args.server_log, "w") if args.server_log
             else subprocess.DEVNULL)
    proc = subprocess.Popen(cmd, env=env, stdout=log_f, stderr=log_f)
    try:
        # flagship random init + first compiles take minutes
        assert wait_port(args.port, 1800), "server never opened its port"

        # warm every bucket/graph the workload touches: singles per text,
        # then one concurrent warm BURST — grouped batches produce code
        # lengths (and so synthesis cbucket groups) that boot warmup's
        # cap-bound decodes never hit, and a mid-burst flagship synthesis
        # compile poisons every percentile of the measured phase
        for text in texts:
            post_tts(args.port, {"text": text, "spk_audio": prompt_hex})
        for _ in range(2):
            post_tts(args.port, {"text": texts[0], "spk_audio": prompt_hex})
        warm_threads = []
        for i in range(args.concurrency):
            th = threading.Thread(target=lambda i=i: post_tts(
                args.port, {"text": texts[i % 3], "spk_audio": prompt_hex}))
            th.start()
            warm_threads.append(th)
        for th in warm_threads:
            th.join()

        # --- phase 1: single-request latency at the server default config
        rtfs = []
        for i in range(args.single_repeats):
            r = post_tts(args.port, {"text": texts[i % 3],
                                     "spk_audio": prompt_hex})
            rtfs.append(r["inference_time"] / r["audio_length"])
        print(json.dumps({
            "metric": "server_default_single_rtf",
            "value": round(float(np.median(rtfs)), 5),
            "unit": "rtf", "vs_baseline": 0.0,
            "detail": {"profile": args.profile,
                       "note": "server defaults, no env vars "
                               "(num_beams=3 unless artifacts say else)"},
        }), flush=True)

        # --- phase 2: concurrent burst
        latencies, audio = [], [0.0]
        lock = threading.Lock()
        sem = threading.Semaphore(args.concurrency)

        def one(i):
            t0 = time.perf_counter()
            try:
                r = post_tts(args.port, {"text": texts[i % 3],
                                         "spk_audio": prompt_hex})
                dt = time.perf_counter() - t0
                with lock:
                    latencies.append(dt)
                    audio[0] += r["audio_length"]
            finally:
                sem.release()

        t0 = time.perf_counter()
        threads = []
        for i in range(args.requests):
            sem.acquire()
            th = threading.Thread(target=one, args=(i,))
            th.start()
            threads.append(th)
        for th in threads:
            th.join()
        wall = time.perf_counter() - t0
        lat = np.asarray(sorted(latencies))
        print(json.dumps({
            "metric": "server_default_p50_latency",
            "value": round(float(np.percentile(lat, 50)), 4),
            "unit": "s", "vs_baseline": 0.0,
            "detail": {
                "p90_s": round(float(np.percentile(lat, 90)), 4),
                "requests": args.requests,
                "concurrency": args.concurrency,
                "wall_s": round(wall, 3),
                "audio_seconds": round(audio[0], 2),
                "aggregate_rtf": round(wall / max(audio[0], 1e-9), 4),
            },
        }), flush=True)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()
