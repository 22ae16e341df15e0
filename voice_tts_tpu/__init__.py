"""voice_tts_tpu — a TPU-native (JAX/XLA/Pallas/pjit) zero-shot TTS serving framework.

Re-implements the capabilities of the IndexTTS2 serving stack
(reference: caishiqing/voice-tts, `server.py` + `indextts/infer_v2.py`) with a
TPU-first design:

- audio frontend (resample -> STFT -> mel, kaldi fbank, seamless features) as
  jitted matmul-DFT graphs (`voice_tts_tpu.audio`)
- conditioning encoders (w2v-bert, RepCodec, CAMPPlus) as flax modules
  (`voice_tts_tpu.models.conditioning`)
- GPT acoustic-token decoder with a fixed-shape `lax.while_loop` decode loop and
  preallocated KV cache (`voice_tts_tpu.models.gpt`)
- flow-matching DiT semantic-to-mel stage as a `lax.scan` over Euler steps
  (`voice_tts_tpu.models.s2mel`)
- BigVGAN vocoder with a fused Pallas anti-alias snake activation kernel
  (`voice_tts_tpu.models.vocoder`, `voice_tts_tpu.ops`)
- sharding/mesh utilities for multi-chip serving and training
  (`voice_tts_tpu.parallel`)
- a stateless REST serving layer with continuous batching
  (`voice_tts_tpu.serving`)
"""

__version__ = "0.1.0"
