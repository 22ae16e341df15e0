"""Jittable audio frontend: STFT/mel, kaldi fbank, seamless features, resampling."""

from voice_tts_tpu.audio.mel import MelSpectrogram, slaney_mel_matrix
from voice_tts_tpu.audio.kaldi import KaldiFbank, SeamlessFeatures, kaldi_mel_matrix
from voice_tts_tpu.audio.resample import Resampler, resample
from voice_tts_tpu.audio.wav import (
    decode_audio_bytes,
    encode_wav_int16,
    load_prompt_audio,
)

__all__ = [
    "MelSpectrogram", "slaney_mel_matrix", "KaldiFbank", "SeamlessFeatures",
    "kaldi_mel_matrix", "Resampler", "resample", "decode_audio_bytes",
    "encode_wav_int16", "load_prompt_audio",
]
