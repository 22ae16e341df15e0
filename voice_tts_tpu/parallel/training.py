"""Sharded training step for the UnifiedVoice GPT.

The reference ships no training loop (inference-only repo); this provides the
framework-native one: next-token cross-entropy on both the text and mel
streams (the dual-head objective implied by `model_v2.py:486-512`), sharded
dp (batch) x tp (parameters) over a `jax.sharding.Mesh`, with XLA inserting
the ICI collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voice_tts_tpu.config import GPTConfig
from voice_tts_tpu.models.gpt.unified_voice import UnifiedVoice
from voice_tts_tpu.parallel.mesh import sharding_tree


def gpt_loss(model: UnifiedVoice, params, batch) -> jnp.ndarray:
    """Teacher-forced dual cross-entropy.

    batch: cond_latents (B,34-2,D is built inside), spk_cond (B,Tc,1024),
    emo_cond (B,Te,1024), text (B,L), text_len (B,), codes (B,M), code_len (B,).
    """
    c: GPTConfig = model.cfg

    def forward(m: UnifiedVoice):
        cond = m.get_conditioning(batch["spk_cond"])
        emovec = m.get_emovec(batch["emo_cond"])
        text, codes = batch["text"], batch["codes"]
        b, l = text.shape
        mcount = codes.shape[1]

        pos_t = jnp.arange(l)
        text_in = jnp.where(pos_t[None] < batch["text_len"][:, None], text,
                            c.stop_text_token)
        pos_m = jnp.arange(mcount)
        mel_in = jnp.where(pos_m[None] < batch["code_len"][:, None], codes,
                           c.stop_mel_token)

        def aligned(x, start, stop):
            inp = jnp.concatenate(
                [jnp.full((b, 1), start, x.dtype), x], axis=1)
            tar = jnp.concatenate(
                [x, jnp.full((b, 1), stop, x.dtype)], axis=1)
            return inp, tar

        # reference pads one stop first, then start/stop alignment
        text_in = jnp.concatenate(
            [text_in, jnp.full((b, 1), c.stop_text_token, text.dtype)], axis=1)
        mel_in = jnp.concatenate(
            [mel_in, jnp.full((b, 1), c.stop_mel_token, codes.dtype)], axis=1)
        text_inp, text_tar = aligned(text_in, c.start_text_token, c.stop_text_token)
        mel_inp, mel_tar = aligned(mel_in, c.start_mel_token, c.stop_mel_token)

        conds = m.conds_latent(cond, emovec)
        text_emb = (m.text_embedding(text_inp)
                    + m.text_pos_embedding(jnp.arange(text_inp.shape[1]))[None])
        mel_emb = (m.mel_embedding(mel_inp)
                   + m.mel_pos_embedding(jnp.arange(mel_inp.shape[1]))[None])
        emb = jnp.concatenate([conds, text_emb, mel_emb], axis=1)
        hidden, _ = m.gpt(emb)
        enc = m.final_norm(hidden[:, conds.shape[1]:])
        text_latent = enc[:, : text_inp.shape[1]]
        mel_latent = enc[:, -mel_inp.shape[1]:]
        tl = m.text_head(text_latent)
        ml = m.mel_head(mel_latent)

        t_loss = optax.softmax_cross_entropy_with_integer_labels(tl, text_tar)
        m_loss = optax.softmax_cross_entropy_with_integer_labels(ml, mel_tar)
        return jnp.mean(t_loss) * 0.01 + jnp.mean(m_loss)

    return model.apply(params, method=lambda m: forward(m))


def make_train_step(model: UnifiedVoice, optimizer: optax.GradientTransformation,
                    mesh: Mesh):
    """Returns (init_state, train_step) jitted with dp/tp shardings."""

    def init_state(params):
        return {"params": params, "opt": optimizer.init(params["params"])}

    data_spec = NamedSharding(mesh, P("dp"))

    @jax.jit
    def train_step(state, batch):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(lambda _: data_spec, batch))

        def loss_fn(p):
            return gpt_loss(model, {"params": p}, batch)

        loss, grads = jax.value_and_grad(loss_fn)(state["params"]["params"])
        updates, opt = optimizer.update(grads, state["opt"],
                                        state["params"]["params"])
        new_params = optax.apply_updates(state["params"]["params"], updates)
        return {"params": {"params": new_params}, "opt": opt}, loss

    return init_state, train_step
