"""Kaldi-style fbank features + SeamlessM4T w2v-bert feature extractor.

Covers the two 16 kHz conditioning feature paths of the reference engine:

- `torchaudio.compliance.kaldi.fbank(num_mel_bins=80, dither=0)` feeding
  CAMPPlus (reference `infer_v2.py:529-533`);
- HF `SeamlessM4TFeatureExtractor` feeding w2v-bert (reference
  `infer_v2.py:114,519-524`): same fbank core, then per-mel-bin zero-mean /
  unit-variance normalization and stride-2 frame stacking (80 -> 160 dims).

The fbank core is a single jittable graph: dc-offset removal, preemphasis,
povey window, zero-pad to n_fft, matmul-DFT power spectrum, kaldi mel
triangles, log with floor.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from voice_tts_tpu.audio import filters
from voice_tts_tpu.audio.stft import frame_signal, frame_power_spectrum


class KaldiFbank:
    """Kaldi fbank: waveform (B, T) in [-1, 1] -> log-mel (B, F, n_mels)."""

    def __init__(self, sample_rate: int = 16000, num_mel_bins: int = 80,
                 frame_length: int = 400, frame_shift: int = 160,
                 n_fft: int = 512, preemphasis: float = 0.97,
                 remove_dc_offset: bool = True, low_freq: float = 20.0,
                 high_freq: float | None = None,
                 mel_floor: float = 1.192092955078125e-07,
                 waveform_scale: float = 32768.0):
        self.frame_length = frame_length
        self.frame_shift = frame_shift
        self.preemphasis = preemphasis
        self.remove_dc_offset = remove_dc_offset
        self.waveform_scale = waveform_scale
        self.mel_floor = mel_floor
        window = filters.povey_window(frame_length)
        cos_m, sin_m = filters.dft_matrices(n_fft, window, frame_length=frame_length)
        mel = filters.kaldi_mel_matrix(sample_rate, n_fft, num_mel_bins,
                                       low_freq, high_freq)
        self._cos = jnp.asarray(cos_m)
        self._sin = jnp.asarray(sin_m)
        self._mel_t = jnp.asarray(mel.T)

    def num_frames(self, num_samples: int) -> int:
        # snip_edges=True convention
        if num_samples < self.frame_length:
            return 0
        return 1 + (num_samples - self.frame_length) // self.frame_shift

    @partial(jax.jit, static_argnums=0)
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        x = audio.astype(jnp.float32) * self.waveform_scale
        # frame with one extra leading sample so preemphasis sees the
        # kaldi-style per-frame boundary (x[0] preemphasized against itself)
        frames = frame_signal(x, self.frame_length, self.frame_shift)
        if self.remove_dc_offset:
            frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
        if self.preemphasis > 0:
            prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
            frames = frames - self.preemphasis * prev
        power = frame_power_spectrum(frames, self._cos, self._sin)
        mel = jnp.matmul(power, self._mel_t, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.log(jnp.maximum(mel, self.mel_floor))


class SeamlessFeatures:
    """SeamlessM4TFeatureExtractor clone producing (B, F//2, 160) features.

    Per-utterance per-mel-bin normalization uses the unpadded length; for the
    single-prompt serving path the batch is unpadded so a plain ddof=1
    normalization over frames matches HF exactly.
    """

    def __init__(self, sample_rate: int = 16000, num_mel_bins: int = 80,
                 stride: int = 2):
        self.fbank = KaldiFbank(sample_rate=sample_rate, num_mel_bins=num_mel_bins)
        self.stride = stride
        self.num_mel_bins = num_mel_bins

    def num_output_frames(self, num_samples: int) -> int:
        f = self.fbank.num_frames(num_samples)
        # HF pads frames to a multiple of 2 (pad_to_multiple_of=2) before stacking
        f = f + (-f) % self.stride
        return f // self.stride

    @partial(jax.jit, static_argnums=0)
    def __call__(self, audio: jnp.ndarray,
                 valid_samples: jnp.ndarray | None = None
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """audio (B, T) -> (input_features (B, F', 160), attention_mask (B, F')).

        `valid_samples` (B,) marks the true audio length inside a zero-padded
        fixed-shape buffer; normalization statistics and the attention mask
        then cover valid frames only, matching HF's per-utterance behaviour.
        """
        feats = self.fbank(audio)  # (B, F, 80)
        b, f, c = feats.shape
        if valid_samples is not None:
            valid_frames = jnp.maximum(
                (valid_samples - self.fbank.frame_length)
                // self.fbank.frame_shift + 1, 0)
            fmask = (jnp.arange(f)[None, :] < valid_frames[:, None])
            m = fmask[..., None].astype(feats.dtype)
            n = jnp.maximum(valid_frames, 2)[:, None, None].astype(feats.dtype)
            mean = jnp.sum(feats * m, axis=1, keepdims=True) / n
            var = jnp.sum(((feats - mean) * m) ** 2, axis=1, keepdims=True) / (n - 1)
            feats = (feats - mean) / jnp.sqrt(var + 1e-7) * m
        else:
            valid_frames = jnp.full((b,), f, dtype=jnp.int32)
            mean = jnp.mean(feats, axis=1, keepdims=True)
            var = jnp.sum((feats - mean) ** 2, axis=1, keepdims=True) / max(f - 1, 1)
            feats = (feats - mean) / jnp.sqrt(var + 1e-7)

        pad = (-f) % self.stride
        if pad:
            feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
        fp = feats.shape[1]
        stacked = feats.reshape(b, fp // self.stride, c * self.stride)
        mask = (jnp.arange(fp // self.stride)[None, :]
                < (valid_frames // self.stride)[:, None]).astype(jnp.int32)
        return stacked, mask


kaldi_mel_matrix = filters.kaldi_mel_matrix
