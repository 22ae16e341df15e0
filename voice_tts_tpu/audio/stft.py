"""Framing + matmul-DFT building block.

On TPU an STFT is best expressed as framing + two matmuls (the DFT matrices
live in VMEM and the contraction rides the MXU); XLA has no fused FFT that
beats this at n_fft ~= 512-1024.  Framing lowers to a strided conv patch
extraction, which XLA handles natively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Slice ``x`` (B, T) into frames (B, F, frame_length); F = 1+(T-len)//hop."""
    b, t = x.shape
    n_frames = 1 + (t - frame_length) // hop
    # conv_general_dilated_patches extracts sliding windows as a conv; this is
    # the TPU-friendly framing path (no gather).
    patches = jax.lax.conv_general_dilated_patches(
        x[:, None, :],  # (B, C=1, T)
        filter_shape=(frame_length,),
        window_strides=(hop,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, frame_length, F)
    return jnp.transpose(patches, (0, 2, 1))[:, :n_frames, :]


def frame_power_spectrum(frames: jnp.ndarray, cos_m: jnp.ndarray,
                         sin_m: jnp.ndarray) -> jnp.ndarray:
    """|DFT|^2 of pre-windowed frames: (B, F, L) x (L, bins) -> (B, F, bins).

    HIGHEST precision: the frontend feeds parity-sensitive conditioning and is
    a negligible share of pipeline FLOPs, so full-fp32 MXU passes are cheap.
    """
    re = jnp.matmul(frames, cos_m, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, sin_m, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return re * re + im * im
