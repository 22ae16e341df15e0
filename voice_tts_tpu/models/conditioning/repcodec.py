"""RepCodec semantic codec: w2v-bert features -> discrete semantic codes.

Parity with reference
`utils/maskgct/models/codec/kmeans/repcodec_model.py` (encoder = VocosBackbone
ConvNeXt stack + linear) and
`amphion_codec/quantize/factorized_vector_quantize.py` (single L2-normalized
factorized VQ).  The serving path uses `__call__` (quantize) and
`repcodec_vq2emb`; `reconstruct` provides the full autoencode for codec
analysis.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from voice_tts_tpu.config import RepCodecConfig
from voice_tts_tpu.models.layers import Conv1d, LayerNorm, Linear


class ConvNeXtBlock(nn.Module):
    dim: int
    intermediate_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x (B, C, T)
        residual = x
        x = Conv1d(self.dim, 7, padding=3, groups=self.dim, name="dwconv")(x)
        x = jnp.transpose(x, (0, 2, 1))
        x = LayerNorm(eps=1e-6, name="norm")(x)
        x = Linear(self.intermediate_dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = Linear(self.dim, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        x = gamma * x
        x = jnp.transpose(x, (0, 2, 1))
        return residual + x


class VocosBackbone(nn.Module):
    dim: int
    intermediate_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x (B, C, T) -> (B, T, dim)
        x = Conv1d(self.dim, 7, padding=3, name="embed")(x)
        x = jnp.transpose(x, (0, 2, 1))
        x = LayerNorm(eps=1e-6, name="norm")(x)
        x = jnp.transpose(x, (0, 2, 1))
        for i in range(self.num_layers):
            x = ConvNeXtBlock(self.dim, self.intermediate_dim,
                              name=f"convnext_{i}")(x)
        x = jnp.transpose(x, (0, 2, 1))
        return LayerNorm(eps=1e-6, name="final_layer_norm")(x)


class FactorizedVQ(nn.Module):
    """L2-normalized factorized VQ (codebook_dim << input_dim)."""

    input_dim: int
    codebook_size: int
    codebook_dim: int

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """z (B, D, T) -> (indices (B, T), z_q (B, D, T))."""
        z_e = Conv1d(self.codebook_dim, 1, name="in_project")(z)  # (B, d, T)
        codebook = self.param("codebook", nn.initializers.normal(1.0),
                              (self.codebook_size, self.codebook_dim))

        enc = jnp.transpose(z_e, (0, 2, 1))  # (B, T, d)
        enc_n = enc / jnp.maximum(
            jnp.linalg.norm(enc, axis=-1, keepdims=True), 1e-12)
        cb_n = codebook / jnp.maximum(
            jnp.linalg.norm(codebook, axis=-1, keepdims=True), 1e-12)
        # argmin ||e - c||^2 == argmax e.c for unit vectors; keep the full
        # distance form for exact tie behaviour with the reference
        dist = (jnp.sum(enc_n ** 2, axis=-1, keepdims=True)
                - 2.0 * jnp.einsum("btd,kd->btk", enc_n, cb_n,
                                   precision=jax.lax.Precision.HIGHEST)
                + jnp.sum(cb_n ** 2, axis=-1)[None, None, :])
        indices = jnp.argmax(-dist, axis=-1)  # (B, T)

        z_q = jnp.take(codebook, indices, axis=0)           # (B, T, d)
        z_q = jnp.transpose(z_q, (0, 2, 1))                  # (B, d, T)
        z_q = Conv1d(self.input_dim, 1, name="out_project")(z_q)
        return indices, z_q


class RepCodec(nn.Module):
    cfg: RepCodecConfig

    def setup(self):
        cfg = self.cfg
        self.downsampled = bool(cfg.downsample_scale and cfg.downsample_scale > 1)
        if self.downsampled:
            self.down = Conv1d(cfg.hidden_size, 3, stride=2, padding=1,
                               name="down")
            self.up = Conv1d(cfg.hidden_size, 3, padding=1, name="up")
        self.encoder_backbone = VocosBackbone(
            cfg.vocos_dim, cfg.vocos_intermediate_dim, cfg.vocos_num_layers)
        self.encoder_out = Linear(cfg.hidden_size)
        self.quantizer = FactorizedVQ(cfg.hidden_size, cfg.codebook_size,
                                      cfg.codebook_dim)
        self.decoder_backbone = VocosBackbone(
            cfg.vocos_dim, cfg.vocos_intermediate_dim, cfg.vocos_num_layers)
        self.decoder_out = Linear(cfg.hidden_size)

    def _quantize(self, x: jnp.ndarray):
        h = jnp.transpose(x, (0, 2, 1))  # (B, H, T)
        if self.downsampled:
            h = nn.gelu(self.down(h), approximate=False)
        h = self.encoder_backbone(h)
        h = self.encoder_out(h)          # (B, T, H)
        h = jnp.transpose(h, (0, 2, 1))
        return self.quantizer(h)

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """quantize: features (B, T, H) -> (codes (B, T), quantized (B, T, H))."""
        indices, z_q = self._quantize(x)
        return indices, jnp.transpose(z_q, (0, 2, 1))

    def reconstruct(self, x: jnp.ndarray) -> jnp.ndarray:
        """Full autoencoding pass (reference `repcodec_model.py:140-173`).

        Not on the serving path; init via `init_full` to create the decoder.
        """
        _, z_q = self._quantize(x)       # (B, H, T)
        h = self.decoder_backbone(z_q)
        h = self.decoder_out(h)          # (B, T, H)
        if self.downsampled:
            h = jnp.transpose(h, (0, 2, 1))
            h = jnp.repeat(h, 2, axis=-1)  # nearest x2
            h = self.up(h)
            h = jnp.transpose(h, (0, 2, 1))
        return h

    def init_full(self, x: jnp.ndarray):
        """Touches encoder + decoder so `init` creates the full tree."""
        indices, z_q = self(x)
        rec = self.reconstruct(x)
        return indices, z_q, rec


def repcodec_vq2emb(variables, codes: jnp.ndarray) -> jnp.ndarray:
    """codes (B, T) -> (B, T, H): codebook lookup + out-projection, matching
    `semantic_codec.quantizer.vq2emb(codes).transpose(1,2)`
    (reference `infer_v2.py:716-718`)."""
    p = variables["params"]["quantizer"]
    # clip: bucket padding may carry the (out-of-vocabulary) stop token
    z_q = jnp.take(p["codebook"], codes, axis=0, mode="clip")  # (B, T, d)
    w = p["out_project"]["weight"]                # (H, d, 1)
    b = p["out_project"]["bias"]
    return jnp.einsum("btd,hdk->bth", z_q, w) + b[None, None, :]
