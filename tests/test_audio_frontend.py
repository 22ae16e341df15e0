"""Audio frontend parity tests.

Oracles:
- torch.stft (torch-cpu is available) re-implements the published reference
  mel formula (`s2mel/modules/audio.py:45-82`) as a test oracle;
- HF SeamlessM4TFeatureExtractor (pure numpy) for the w2v-bert features;
- analytic properties for the resampler.
"""

import numpy as np
import pytest

from voice_tts_tpu.audio import (
    KaldiFbank, MelSpectrogram, Resampler, SeamlessFeatures,
    decode_audio_bytes, encode_wav_int16,
)
from voice_tts_tpu.audio.filters import slaney_mel_matrix
from voice_tts_tpu.config import MelConfig


def _torch_reference_logmel(audio_np, cfg: MelConfig):
    """Test oracle implementing the reference mel formula with torch ops."""
    import torch

    y = torch.from_numpy(audio_np)
    pad = int((cfg.n_fft - cfg.hop_size) / 2)
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    window = torch.hann_window(cfg.win_size)
    spec = torch.stft(y, cfg.n_fft, hop_length=cfg.hop_size, win_length=cfg.win_size,
                      window=window, center=False, pad_mode="reflect",
                      normalized=False, onesided=True, return_complex=True)
    spec = torch.view_as_real(spec)
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    mel = torch.from_numpy(
        slaney_mel_matrix(cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax))
    out = torch.matmul(mel, spec)
    return torch.log(torch.clamp(out, min=1e-5)).numpy()


@pytest.mark.parametrize("num_samples", [22050, 4096 + 123])
def test_mel_matches_torch_stft_oracle(num_samples):
    cfg = MelConfig()
    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.8, 0.8, size=(2, num_samples)).astype(np.float32)

    ours = np.asarray(MelSpectrogram(cfg)(audio))
    ref = _torch_reference_logmel(audio, cfg)

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_mel_num_frames_helper():
    cfg = MelConfig()
    m = MelSpectrogram(cfg)
    audio = np.zeros((1, 22050), dtype=np.float32)
    assert m(audio).shape[2] == m.num_frames(22050)


def test_seamless_features_match_transformers():
    from transformers import SeamlessM4TFeatureExtractor

    rng = np.random.default_rng(1)
    audio = rng.uniform(-0.5, 0.5, size=16000).astype(np.float32)

    hf = SeamlessM4TFeatureExtractor()
    ref = hf(audio, sampling_rate=16000, return_tensors="np")
    ref_feats = ref["input_features"][0]

    ours, mask = SeamlessFeatures()(audio[None, :])
    ours = np.asarray(ours)[0]

    assert ours.shape == ref_feats.shape
    np.testing.assert_allclose(ours, ref_feats, atol=2e-3, rtol=1e-3)
    assert np.asarray(mask).shape[1] == ref["attention_mask"].shape[1]


def test_kaldi_fbank_matches_hf_spectrogram():
    """Cross-check the fbank core against HF's generic numpy spectrogram."""
    from transformers.audio_utils import mel_filter_bank, spectrogram, window_function

    rng = np.random.default_rng(2)
    audio = rng.uniform(-0.5, 0.5, size=8000).astype(np.float32)

    mel_filters = mel_filter_bank(
        num_frequency_bins=257, num_mel_filters=80, min_frequency=20,
        max_frequency=8000, sampling_rate=16000, norm=None, mel_scale="kaldi",
        triangularize_in_mel_space=True)
    window = window_function(400, "povey", periodic=False)
    ref = spectrogram(audio * 32768.0, window, frame_length=400, hop_length=160,
                      fft_length=512, power=2.0, center=False, preemphasis=0.97,
                      mel_filters=mel_filters, log_mel="log",
                      mel_floor=1.192092955078125e-07, remove_dc_offset=True).T

    ours = np.asarray(KaldiFbank()(audio[None, :]))[0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_resampler_preserves_tone_and_length():
    sr_in, sr_out = 24000, 22050
    t = np.arange(sr_in, dtype=np.float32) / sr_in
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)

    rs = Resampler(sr_in, sr_out)
    out = np.asarray(rs(tone[None, :]))[0]
    assert out.shape[0] == rs.output_length(sr_in) == 22050

    # dominant frequency must stay at 440 Hz
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * sr_out / len(out)
    assert abs(peak_hz - 440.0) < 2.0
    # amplitude roughly preserved
    assert 0.9 < np.max(np.abs(out[100:-100])) < 1.1


def test_resampler_downsample_16k():
    rs = Resampler(22050, 16000)
    x = np.random.default_rng(3).normal(size=(1, 22050)).astype(np.float32)
    y = np.asarray(rs(x))
    assert y.shape == (1, 16000)


def test_wav_roundtrip():
    sr = 22050
    x = (np.sin(np.linspace(0, 100, 4410)) * 20000).astype(np.int16)
    data = encode_wav_int16(x, sr)
    decoded, got_sr = decode_audio_bytes(data)
    assert got_sr == sr
    np.testing.assert_allclose(decoded, x.astype(np.float32) / 32768.0, atol=1e-6)


def test_seamless_masked_padding_matches_unpadded():
    """Zero-padded fixed-shape input + valid_samples == exact-length output."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    true = 9000
    audio = rng.uniform(-0.5, 0.5, size=true).astype(np.float32)

    sf = SeamlessFeatures()
    exact, exact_mask = sf(audio[None, :])

    padded = np.zeros((1, 16000), dtype=np.float32)
    padded[0, :true] = audio
    feats, mask = sf(padded, jnp.asarray([true]))
    n_valid = int(np.asarray(mask).sum())
    assert n_valid == np.asarray(exact_mask).sum()
    np.testing.assert_allclose(np.asarray(feats)[0, :n_valid],
                               np.asarray(exact)[0, :n_valid], atol=2e-4,
                               rtol=1e-3)


def test_mel_prepadded_matches_direct():
    from voice_tts_tpu.config import MelConfig as MC

    cfg = MC()
    m = MelSpectrogram(cfg)
    audio = np.random.default_rng(6).uniform(-0.5, 0.5, (1, 12800)).astype(np.float32)
    direct = np.asarray(m(audio))
    pre = np.asarray(m.on_prepadded(np.asarray(m.pad_reflect(audio))))
    np.testing.assert_allclose(pre, direct, atol=1e-6)
