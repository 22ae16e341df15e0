"""On-chip compile + run smoke for the batched decode megakernel
(the Mosaic `(B,) -> (B,1,1)` shape-cast fix in ops/fused_decode.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["FUSED_BATCH"] = "1"

import numpy as np

from voice_tts_tpu.audio import encode_wav_int16
from bench import build_engine


def main():
    eng = build_engine(False)
    eng.cfg.engine.use_fused_batch_decode = True
    sr = 22050
    t = np.arange(3 * sr) / sr
    p = encode_wav_int16((0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)
    res = eng.infer_batch([
        {"spk_audio_prompt": p, "text": "你好世界朋友们."},
        {"spk_audio_prompt": p, "text": "今天天气很好."}])
    print("BATCH_SMOKE_OK", [len(r.wav) for r in res])


if __name__ == "__main__":
    main()
