"""Polyphase windowed-sinc resampler.

Implements the same algorithm as torchaudio's `Resample` /
`functional.resample` (sinc interpolation with a hann-windowed lowpass,
`lowpass_filter_width=6`, `rolloff=0.99`), which is what the reference engine
uses to produce the 22.05 kHz and 16 kHz prompt branches
(reference `infer_v2.py:515-517`).

The kernel bank is built host-side in numpy; application is a single strided
grouped conv that XLA maps onto the MXU.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def _sinc_resample_kernel(orig_freq: int, new_freq: int,
                          lowpass_filter_width: int = 6,
                          rolloff: float = 0.99) -> tuple[np.ndarray, int, int, int]:
    """Returns (kernels (new_freq, 1, K), width, orig_freq, new_freq) after gcd."""
    gcd = math.gcd(int(orig_freq), int(new_freq))
    orig_freq = int(orig_freq) // gcd
    new_freq = int(new_freq) // gcd

    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)

    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    tpi = t * np.pi
    scale = base_freq / orig_freq
    kernels = np.where(tpi == 0, 1.0, np.sin(tpi) / np.where(tpi == 0, 1.0, tpi))
    kernels = kernels * window * scale
    return kernels.astype(np.float32)[:, None, :], width, orig_freq, new_freq


class Resampler:
    """Fixed-rate-pair jittable resampler for (B, T) signals."""

    def __init__(self, orig_sr: int, new_sr: int):
        kernels, width, o, n = _sinc_resample_kernel(orig_sr, new_sr)
        self.orig_sr, self.new_sr = orig_sr, new_sr
        self._kernels = jnp.asarray(kernels)  # (n, 1, K)
        self._width = width
        self._o, self._n = o, n

    def output_length(self, length: int) -> int:
        return int(math.ceil(self._n * length / self._o))

    @partial(jax.jit, static_argnums=0)
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self._o == self._n:
            return x
        b, t = x.shape
        target_len = self.output_length(t)
        xp = jnp.pad(x, ((0, 0), (self._width, self._width + self._o)))
        # conv with n output channels (one per output phase), stride orig_freq
        y = jax.lax.conv_general_dilated(
            xp[:, None, :], self._kernels,
            window_strides=(self._o,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )  # (B, n, T//o + 1)
        y = jnp.transpose(y, (0, 2, 1)).reshape(b, -1)
        return y[:, :target_len]


@lru_cache(maxsize=16)
def _cached_resampler(orig_sr: int, new_sr: int) -> Resampler:
    return Resampler(orig_sr, new_sr)


def resample(x, orig_sr: int, new_sr: int):
    """Convenience wrapper; accepts (T,) or (B, T), numpy or jax arrays."""
    arr = jnp.asarray(x, dtype=jnp.float32)
    squeeze = arr.ndim == 1
    if squeeze:
        arr = arr[None, :]
    out = _cached_resampler(int(orig_sr), int(new_sr))(arr)
    return out[0] if squeeze else out
