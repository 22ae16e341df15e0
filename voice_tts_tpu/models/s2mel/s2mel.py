"""s2mel stage: GPT codes + latent -> mel spectrogram.

Combines the pieces the reference wires through `MyModel`
(`s2mel/modules/commons.py:388-438`): the `gpt_layer` linear chain
(1280 -> 256 -> 128 -> 1024, *no activations*), the length regulator, and the
CFM/DiT estimator.  The per-request condition assembly mirrors
`infer_v2.py:713-731`:

    latent' = gpt_layer(gpt_latent)
    S_infer = vq2emb(codes) + latent'
    cond    = length_regulator(S_infer, ceil(1.72 * code_len))
    cat     = [prompt_condition ; cond]
    mel     = CFM(cat, ref_mel, style, 25 steps, cfg 0.7)[:, :, prompt_len:]

All sequence arithmetic runs on static buckets with dynamic valid lengths.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from voice_tts_tpu.config import S2MelConfig
from voice_tts_tpu.models.layers import Linear
from voice_tts_tpu.models.s2mel.dit import DiT
from voice_tts_tpu.models.s2mel.length_regulator import InterpolateRegulator


class S2Mel(nn.Module):
    cfg: S2MelConfig

    def setup(self):
        c = self.cfg
        dims = list(c.gpt_layer_hidden) + [c.gpt_layer_out]
        self.gpt_layers = [Linear(d, name=f"gpt_layer_{i}")
                           for i, d in enumerate(dims)]
        self.length_regulator = InterpolateRegulator(c.length_regulator)
        self.estimator = DiT(c.dit, c.wavenet)

    def gpt_layer(self, latent: jnp.ndarray) -> jnp.ndarray:
        for layer in self.gpt_layers:
            latent = layer(latent)
        return latent

    def regulate(self, s: jnp.ndarray, src_len: jnp.ndarray,
                 target_len: jnp.ndarray, out_max: int) -> jnp.ndarray:
        return self.length_regulator(s, src_len, target_len, out_max)

    def velocity(self, x, prompt_x, x_lens, t, style, mu, tables=None,
                 fused_w=None):
        return self.estimator(x, prompt_x, x_lens, t, style, mu,
                              tables=tables, fused_w=fused_w)

    def step_tables(self, t_span):
        """Batched timestep-dependent projections for the CFM scan
        (see `DiT.step_tables`)."""
        return self.estimator.step_tables(t_span)

    def __call__(self, s, src_len, target_len, out_max, x, prompt_x, x_lens,
                 t, style, latent):
        """init-only composite touching every submodule."""
        cond = self.regulate(s, src_len, target_len, out_max)
        v = self.velocity(x, prompt_x, x_lens, t, style, cond)
        return v, self.gpt_layer(latent)


def assemble_condition(prompt_condition: jnp.ndarray, prompt_len: jnp.ndarray,
                       cond: jnp.ndarray, cond_len: jnp.ndarray,
                       total_max: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[prompt_condition[:prompt_len] ; cond[:cond_len]] into a static buffer.

    prompt_condition (B, P_bucket, D), cond (B, T_bucket, D) ->
    (cat (B, total_max, D), total_len (B,)).  Mirrors
    `torch.cat([prompt_condition, cond], dim=1)` with dynamic splice point.
    """
    b, pb, d = prompt_condition.shape
    frame = jnp.arange(total_max)
    pmask = frame[None, :] < prompt_len[:, None]

    buf = jnp.zeros((b, total_max, d), dtype=prompt_condition.dtype)
    buf = buf.at[:, :pb, :].set(prompt_condition)
    buf = jnp.where(pmask[..., None], buf, 0.0)

    # gather cond at j - prompt_len for positions past the prompt
    idx = jnp.clip(frame[None, :] - prompt_len[:, None], 0, cond.shape[1] - 1)
    shifted = jnp.take_along_axis(cond, idx[..., None], axis=1)
    total_len = prompt_len + cond_len
    cmask = (~pmask) & (frame[None, :] < total_len[:, None])
    cat = jnp.where(cmask[..., None], shifted, buf)
    return cat, total_len


def place_prompt_mel(ref_mel: jnp.ndarray, prompt_len: jnp.ndarray,
                     total_max: int) -> jnp.ndarray:
    """ref_mel (B, 80, P_bucket) -> (B, 80, total_max) zero past prompt_len."""
    b, n_mels, pb = ref_mel.shape
    out = jnp.zeros((b, n_mels, total_max), dtype=ref_mel.dtype)
    out = out.at[:, :, :pb].set(ref_mel)
    frame = jnp.arange(total_max)
    mask = (frame[None, None, :] < prompt_len[:, None, None])
    return jnp.where(mask, out, 0.0)


def slice_generated(mel: jnp.ndarray, prompt_len: jnp.ndarray,
                    out_max: int) -> jnp.ndarray:
    """mel (B, 80, total) -> generated region (B, 80, out_max)
    (mirrors `vc_target[:, :, ref_mel.size(-1):]`)."""
    b = mel.shape[0]
    frame = jnp.arange(out_max)
    idx = jnp.clip(frame[None, :] + prompt_len[:, None], 0, mel.shape[2] - 1)
    return jnp.take_along_axis(mel, idx[:, None, :].repeat(mel.shape[1], axis=1),
                               axis=2)
