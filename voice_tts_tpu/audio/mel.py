"""Synthesis-side log-mel spectrogram.

Numerically matches the reference mel frontend
(`s2mel/modules/audio.py:45-82`): reflect-pad by (n_fft - hop)/2, periodic
hann, torch.stft(center=False), magnitude = sqrt(power + 1e-9), slaney mel
basis, log(clamp(x, 1e-5)).  Output layout (B, n_mels, frames).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from voice_tts_tpu.audio import filters
from voice_tts_tpu.audio.stft import frame_signal, frame_power_spectrum
from voice_tts_tpu.config import MelConfig


class MelSpectrogram:
    """Precomputed-constant, jittable log-mel transform."""

    def __init__(self, cfg: MelConfig):
        self.cfg = cfg
        window = filters.hann_window(cfg.win_size, periodic=True)
        if cfg.win_size < cfg.n_fft:
            # torch.stft centers the window inside the fft frame
            pad = (cfg.n_fft - cfg.win_size) // 2
            window = np.pad(window, (pad, cfg.n_fft - cfg.win_size - pad))
        cos_m, sin_m = filters.dft_matrices(cfg.n_fft, window)
        mel = filters.slaney_mel_matrix(cfg.sample_rate, cfg.n_fft, cfg.num_mels,
                                        cfg.fmin, cfg.fmax)
        self._cos = jnp.asarray(cos_m)
        self._sin = jnp.asarray(sin_m)
        self._mel_t = jnp.asarray(mel.T)  # (bins, n_mels)
        self._pad = (cfg.n_fft - cfg.hop_size) // 2

    def num_frames(self, num_samples: int) -> int:
        t = num_samples + 2 * self._pad
        return 1 + (t - self.cfg.n_fft) // self.cfg.hop_size

    def pad_reflect(self, audio):
        """The reference's reflect padding, exposed so callers with
        fixed-shape zero-padded buffers can pad at the *true* boundary
        host-side before calling `on_prepadded`."""
        import numpy as np
        return np.pad(np.asarray(audio), [(0, 0)] * (audio.ndim - 1)
                      + [(self._pad, self._pad)], mode="reflect")

    @partial(jax.jit, static_argnums=0)
    def on_prepadded(self, padded: jnp.ndarray) -> jnp.ndarray:
        """log-mel of an already reflect-padded signal (B, T + 2*pad)."""
        frames = frame_signal(padded, self.cfg.n_fft, self.cfg.hop_size)
        power = frame_power_spectrum(frames, self._cos, self._sin)
        mag = jnp.sqrt(power + 1e-9)
        mel = jnp.matmul(mag, self._mel_t, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        logmel = jnp.log(jnp.clip(mel, min=1e-5))
        return jnp.transpose(logmel, (0, 2, 1))

    @partial(jax.jit, static_argnums=0)
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        """audio (B, T) float in [-1, 1] -> log-mel (B, n_mels, F)."""
        x = jnp.pad(audio, ((0, 0), (self._pad, self._pad)), mode="reflect")
        frames = frame_signal(x, self.cfg.n_fft, self.cfg.hop_size)
        power = frame_power_spectrum(frames, self._cos, self._sin)
        mag = jnp.sqrt(power + 1e-9)
        mel = jnp.matmul(mag, self._mel_t, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        logmel = jnp.log(jnp.clip(mel, min=1e-5))
        return jnp.transpose(logmel, (0, 2, 1))


slaney_mel_matrix = filters.slaney_mel_matrix
