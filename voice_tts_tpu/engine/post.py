"""Host-side post-processing of generated code/waveform sequences."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def remove_long_silence(codes: np.ndarray, lengths: np.ndarray,
                        stop_token: int, silent_token: int = 52,
                        max_consecutive: int = 30) -> Tuple[np.ndarray, np.ndarray]:
    """Shrink runs of the silent code (reference `infer_v2.py:212-267`).

    codes (B, T) already stop-trimmed to `lengths` (stop excluded); if a row
    contains more than `max_consecutive` silent tokens, runs are capped at 10.
    """
    out_rows: List[np.ndarray] = []
    out_lens = []
    for row, ln in zip(codes, lengths):
        row = row[:ln]
        if int(np.sum(row == silent_token)) > max_consecutive:
            keep = []
            run = 0
            for tok in row.tolist():
                if tok != silent_token:
                    keep.append(tok)
                    run = 0
                elif run < 10:
                    keep.append(tok)
                    run += 1
            row = np.asarray(keep, dtype=codes.dtype)
        out_rows.append(row)
        out_lens.append(len(row))
    max_len = max(out_lens) if out_lens else 0
    out = np.full((len(out_rows), max_len), stop_token, dtype=codes.dtype)
    for i, row in enumerate(out_rows):
        out[i, :len(row)] = row
    return out, np.asarray(out_lens, dtype=np.int64)


def remove_long_silence_jax(codes, lengths, stop_token: int,
                            silent_token: int = 52, max_consecutive: int = 30,
                            pad_value: int = 0):
    """Jittable `remove_long_silence`: same semantics, fixed shapes.

    codes (B, T) int32, lengths (B,) valid counts (stop excluded).  Returns
    (out (B, T), new_lengths (B,)): kept tokens left-compacted, the rest
    filled with `pad_value` (the engine pads with an ordinary code, not the
    stop id — see the synth-input note in engine.py).  Runs on device so the
    decode -> trim -> synthesis chain needs no host round trip.
    """
    import jax
    import jax.numpy as jnp

    b, t = codes.shape
    idx = jnp.arange(t)[None, :]
    valid = idx < lengths[:, None]
    is_sil = (codes == silent_token) & valid
    # run length of consecutive silent tokens ending at each position
    last_non_sil = jax.lax.cummax(
        jnp.where(is_sil, -1, idx), axis=1)                     # (B, T)
    run = idx - last_non_sil
    needs_trim = (jnp.sum(is_sil, axis=1) > max_consecutive)[:, None]
    keep = valid & (~is_sil | (run <= 10) | ~needs_trim)
    new_pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    # scatter kept tokens to their compacted positions (dropped rows -> T,
    # out of range, mode="drop")
    pos = jnp.where(keep, new_pos, t)
    out = jnp.full((b, t), pad_value, dtype=codes.dtype)
    out = out.at[jnp.arange(b)[:, None], pos].set(codes, mode="drop")
    new_lengths = jnp.maximum(jnp.sum(keep, axis=1), 1)
    return out, new_lengths


def insert_interval_silence(wavs: List[np.ndarray], sampling_rate: int = 22050,
                            interval_silence_ms: int = 200) -> np.ndarray:
    """Concatenate segment waveforms with silence gaps
    (reference `infer_v2.py:306-330`)."""
    if not wavs:
        return np.zeros(0, dtype=np.float32)
    if interval_silence_ms <= 0 or len(wavs) == 1:
        return np.concatenate(wavs)
    sil = np.zeros(int(sampling_rate * interval_silence_ms / 1000.0),
                   dtype=wavs[0].dtype)
    pieces = []
    for i, w in enumerate(wavs):
        pieces.append(w)
        if i < len(wavs) - 1:
            pieces.append(sil)
    return np.concatenate(pieces)


def pick_bucket(n: int, buckets) -> int:
    """Smallest bucket >= n (clamped to the largest)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]
