"""Command-line synthesis.

The reference CLI only drives the legacy v1 model and marks v2 as TODO
(`indextts/cli.py:59`); this one drives the v2-equivalent engine:

    python -m voice_tts_tpu.cli "text to speak" -v voice.wav -o gen.wav \
        [--model-dir DIR | --random] [--emo-audio E.wav] [--emo happy]
        [--emo-alpha 0.8]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="voice-tts-tpu", description="TPU-native zero-shot TTS")
    parser.add_argument("text", help="text to synthesize")
    parser.add_argument("-v", "--voice", required=True,
                        help="speaker reference audio (WAV path)")
    parser.add_argument("-o", "--output_path", default="gen.wav",
                        help="output WAV path")
    parser.add_argument("--model-dir", default=None,
                        help="converted model artifacts directory")
    parser.add_argument("--random", action="store_true",
                        help="random weights (smoke test; audio is noise)")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny random config (fast CPU smoke test)")
    parser.add_argument("--emo-audio", default=None,
                        help="emotion reference audio")
    parser.add_argument("--emo", default=None,
                        help="emotion label (e.g. happy / 高兴)")
    parser.add_argument("--emo-alpha", type=float, default=1.0)
    parser.add_argument("-f", "--force", action="store_true",
                        help="overwrite output if it exists")
    parser.add_argument("-d", "--device", default=None,
                        help="jax platform override (cpu/tpu)")
    parser.add_argument("--profile", default="serving",
                        choices=["serving", "stock"],
                        help="'serving' (default): measured-winner fast "
                             "paths (int8 megakernel, fused beam, int8 KV, "
                             "fused pipeline); 'stock': the artifact config "
                             "exactly as saved")
    args = parser.parse_args(argv)

    import os
    if os.path.exists(args.output_path) and not args.force:
        print(f"ERROR: output file {args.output_path} exists "
              f"(use --force/-f to overwrite)", file=sys.stderr)
        return 1
    if not os.path.exists(args.voice):
        print(f"ERROR: voice file {args.voice} does not exist", file=sys.stderr)
        return 1

    import jax
    if args.device:
        jax.config.update("jax_platforms", args.device)

    from voice_tts_tpu.config import TTSConfig
    from voice_tts_tpu.engine import TTSEngine
    from voice_tts_tpu.text.emotion import create_emotion_vector

    if args.model_dir:
        engine = TTSEngine.from_artifacts(args.model_dir,
                                          profile=args.profile)
    elif args.tiny:
        engine = TTSEngine.tiny()
    elif args.random:
        cfg = TTSConfig()
        if args.profile == "serving":
            cfg.apply_serving_profile()
        engine = TTSEngine.random(cfg)
    else:
        print("ERROR: pass --model-dir DIR (converted artifacts), or "
              "--random/--tiny for smoke tests", file=sys.stderr)
        return 1

    emo_vector = create_emotion_vector(args.emo, args.emo_alpha) if args.emo else None
    result = engine.infer(args.voice, args.text, args.output_path,
                          emo_audio_prompt=args.emo_audio,
                          emo_alpha=args.emo_alpha, emo_vector=emo_vector)
    m = result.metrics
    print(f"wrote {args.output_path}: {m['audio_length']:.2f}s audio in "
          f"{m['inference_time']:.2f}s (RTF {m['rtf']:.3f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
