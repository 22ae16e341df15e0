"""UnifiedVoice v2: the acoustic-token GPT with speaker/emotion conditioning.

Architecture parity with reference `indextts/gpt/model_v2.py:304-747`:
sequence layout `[cond(32)+emo | speed_half | speed_full | start,text,stop |
start_mel, mel codes...]`, conformer+perceiver conditioning, learned mel/text
position embeddings, GPT-2 trunk with nulled positional embeddings,
final_norm + mel_head readout.

TPU-native differences:
- decode runs as a fixed-shape `lax.while_loop` over a preallocated KV cache
  (`voice_tts_tpu.models.gpt.decode`), replacing HF `generate`;
- text is right-padded inside a shape bucket with an attention validity mask
  (mathematically identical to the reference's left-padding since the GPT has
  no absolute positions).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from voice_tts_tpu.config import GPTConfig
from voice_tts_tpu.models.gpt.cond_encoder import AttentionConditioningEncoder
from voice_tts_tpu.models.gpt.conformer import ConformerEncoder
from voice_tts_tpu.models.gpt.gpt2 import GPT2Stack
from voice_tts_tpu.models.gpt.perceiver import PerceiverResampler
from voice_tts_tpu.models.layers import Embedding, LayerNorm, Linear


def n_cond_latents(cfg: GPTConfig) -> int:
    """Speaker-conditioning latents in the decode prefix: the perceiver
    branches emit `condition_num_latent`; the reference's functional default
    arm mean-pools to a single latent (`model_v2.py:537-545`)."""
    if cfg.condition_type in ("conformer_perceiver", "perceiver"):
        return cfg.condition_num_latent
    return 1


class UnifiedVoice(nn.Module):
    cfg: GPTConfig

    def setup(self):
        c = self.cfg
        cm, em = c.condition_module, c.emo_condition_module
        if c.condition_type == "conformer_perceiver":
            self.conditioning_encoder = ConformerEncoder(cm)
            self.perceiver_encoder = PerceiverResampler(
                dim=c.model_dim, dim_context=cm.output_size,
                num_latents=c.condition_num_latent, heads=cm.attention_heads,
                ff_mult=cm.perceiver_mult)
        elif c.condition_type == "perceiver":
            # the reference ctor DEFAULT (`model_v2.py:310,349-350`):
            # Conv1d + 6 AttentionBlocks, then a PerceiverResampler at its
            # own defaults (heads=8, ff_mult=4 — NOT the condition_module's)
            self.conditioning_encoder = AttentionConditioningEncoder(
                dim=c.model_dim, num_heads=c.heads)
            self.perceiver_encoder = PerceiverResampler(
                dim=c.model_dim, dim_context=c.model_dim,
                num_latents=c.condition_num_latent)
        elif c.condition_type in ("gst", "conformer_encoder"):
            # these two crash inside the reference itself (gst_encoder never
            # constructed, `model_v2.py:530` vs `:349-366`; ConformerEncoder
            # called with the wrong arity in get_conditioning's else arm,
            # `:533-541`), so no checkpoint can exist for them — see
            # cond_encoder.py
            raise ValueError(
                f"condition_type {c.condition_type!r} is not supported: the "
                f"reference's own get_conditioning raises on this branch "
                f"(model_v2.py:514-543); use 'conformer_perceiver', "
                f"'perceiver', or any other string (mean-pooled default "
                f"encoder)")
        else:
            # the reference's functional default arm (`model_v2.py:366`):
            # ANY other condition_type builds
            # `ConditioningEncoder(1024, dim, num_attn_heads=heads,
            # mean=True)` and get_conditioning mean-pools it to (B, 1, dim)
            # (`model_v2.py:533-545`)
            self.conditioning_encoder = AttentionConditioningEncoder(
                dim=c.model_dim, num_heads=c.heads, mean=True)
        self.emo_conditioning_encoder = ConformerEncoder(em)
        self.emo_perceiver_encoder = PerceiverResampler(
            dim=c.emo_dim, dim_context=em.output_size, num_latents=1,
            heads=em.attention_heads, ff_mult=em.perceiver_mult)

        vocab_text = c.number_text_tokens * c.types + 1
        self.text_embedding = Embedding(vocab_text, c.model_dim)
        self.emovec_layer = Linear(c.model_dim)   # emo_dim -> model_dim
        self.emo_layer = Linear(c.model_dim)      # model_dim -> model_dim
        self.mel_embedding = Embedding(c.number_mel_codes, c.model_dim)
        self.gpt = GPT2Stack(c.layers, c.model_dim, c.heads,
                             c.pallas_decode_attention)
        # reference: LearnedPositionEmbeddings(max_mel_tokens + 2 + 1) / (+2)
        self.mel_pos_embedding = Embedding(c.max_mel_tokens + 3, c.model_dim)
        self.text_pos_embedding = Embedding(c.max_text_tokens + 2, c.model_dim)
        self.final_norm = LayerNorm()
        self.text_head = Linear(vocab_text)
        self.mel_head = Linear(c.number_mel_codes)
        self.speed_emb = Embedding(2, c.model_dim)

    # ------------------------------------------------------------------
    # conditioning
    # ------------------------------------------------------------------

    def get_conditioning(self, spk_cond: jnp.ndarray,
                         lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """spk_cond (B, T, 1024) w2v-bert features -> (B, 32, model_dim)."""
        if self.cfg.condition_type == "perceiver":
            # reference `model_v2.py:515-519`: no length mask on this branch
            h = self.conditioning_encoder(spk_cond)
            return self.perceiver_encoder(h)
        if self.cfg.condition_type != "conformer_perceiver":
            # functional default arm (`model_v2.py:533-545`): mean-pooled
            # ConditioningEncoder, stacked over a singleton conditioning-clip
            # axis and averaged — with the standard (B, T, spec) input that
            # reduces to one encoder call -> (B, dim) -> (B, 1, dim)
            return self.conditioning_encoder(spk_cond)[:, None, :]
        h, mask = self.conditioning_encoder(spk_cond, lengths)
        conds_mask = jnp.concatenate(
            [jnp.ones((h.shape[0], self.cfg.condition_num_latent), dtype=bool),
             mask[:, 0, :]], axis=1)
        return self.perceiver_encoder(h, conds_mask)

    def get_emovec(self, emo_cond: jnp.ndarray,
                   lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """emo_cond (B, T, 1024) -> final emotion vector (B, model_dim)."""
        h, mask = self.emo_conditioning_encoder(emo_cond, lengths)
        conds_mask = jnp.concatenate(
            [jnp.ones((h.shape[0], 1), dtype=bool), mask[:, 0, :]], axis=1)
        raw = self.emo_perceiver_encoder(h, conds_mask)[:, 0]  # (B, emo_dim)
        return self.emo_layer(self.emovec_layer(raw))

    def conds_latent(self, cond_latents: jnp.ndarray,
                     emo_vec: jnp.ndarray) -> jnp.ndarray:
        """[cond+emo | speed_half | speed_full] (B, 34, D)
        (reference `model_v2.py:693-696`: zeros -> full-speed emb last)."""
        b = cond_latents.shape[0]
        half = self.speed_emb(jnp.ones((b, 1), dtype=jnp.int32))
        full = self.speed_emb(jnp.zeros((b, 1), dtype=jnp.int32))
        return jnp.concatenate([cond_latents + emo_vec[:, None, :], half, full],
                               axis=1)

    # ------------------------------------------------------------------
    # teacher-forced forward -> mel latent (feeds s2mel)
    # ------------------------------------------------------------------

    def __call__(self, cond_latents: jnp.ndarray, emo_vec: jnp.ndarray,
                 text_tokens: jnp.ndarray, text_lengths: jnp.ndarray,
                 mel_codes: jnp.ndarray, code_lengths: jnp.ndarray) -> jnp.ndarray:
        """Returns the GPT mel latent (B, M, D), M = mel_codes.shape[1]
        (reference `model_v2.py:554-596`)."""
        c = self.cfg
        b, l = text_tokens.shape
        m = mel_codes.shape[1]

        pos_t = jnp.arange(l)
        text_tokens = jnp.where(pos_t[None, :] < text_lengths[:, None],
                                text_tokens, c.stop_text_token)
        pos_m = jnp.arange(m)
        mel_codes = jnp.where(pos_m[None, :] < code_lengths[:, None],
                              mel_codes, c.stop_mel_token)

        # aligned inputs: [start, x..., stop] (+1 stop appended first, as in
        # reference F.pad chains) -> lengths l+2 / m+2
        text_in = jnp.concatenate(
            [jnp.full((b, 1), c.start_text_token, dtype=text_tokens.dtype),
             text_tokens,
             jnp.full((b, 1), c.stop_text_token, dtype=text_tokens.dtype)], axis=1)
        mel_in = jnp.concatenate(
            [jnp.full((b, 1), c.start_mel_token, dtype=mel_codes.dtype),
             mel_codes,
             jnp.full((b, 1), c.stop_mel_token, dtype=mel_codes.dtype)], axis=1)

        conds = self.conds_latent(cond_latents, emo_vec)
        text_emb = (self.text_embedding(text_in)
                    + self.text_pos_embedding(jnp.arange(l + 2))[None])
        mel_emb = (self.mel_embedding(mel_in)
                   + self.mel_pos_embedding(jnp.arange(m + 2))[None])

        emb = jnp.concatenate([conds, text_emb, mel_emb], axis=1)
        hidden, _ = self.gpt(emb)
        enc = hidden[:, conds.shape[1]:]
        enc = self.final_norm(enc)
        mel_latent = enc[:, -(m + 2):]
        return mel_latent[:, :-2]

    # ------------------------------------------------------------------
    # initialization helper: touches every submodule so `init` creates the
    # full parameter tree (plain __call__ never reaches the LM heads)
    # ------------------------------------------------------------------

    def init_all(self, spk_cond, emo_cond, text_tokens, text_lengths,
                 mel_codes, code_lengths):
        cond = self.get_conditioning(spk_cond)
        emovec = self.get_emovec(emo_cond)
        latent = self(cond, emovec, text_tokens, text_lengths, mel_codes,
                      code_lengths)
        logits = self.mel_head(latent)
        tlogits = self.text_head(latent)
        return latent, logits, tlogits

    # ------------------------------------------------------------------
    # decode-time pieces (called via nn.apply with method=...)
    # ------------------------------------------------------------------

    def build_prompt(self, cond_latents: jnp.ndarray, emo_vec: jnp.ndarray,
                     text_tokens: jnp.ndarray, text_lengths: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Prompt embeddings for AR decode (right-padded bucket layout).

        Returns (embeds (B, P, D), valid (B, P)) with
        P = 34 + bucket_len + 2; layout [conds | start,text,stop,(pad)].
        Padding positions are masked via `valid`; text positions use
        contiguous learned positions 0..len+1 like the reference
        `prepare_gpt_inputs` (`model_v2.py:598-661`).
        """
        c = self.cfg
        b, bl = text_tokens.shape
        conds = self.conds_latent(cond_latents, emo_vec)  # (B, 34, D)

        pos = jnp.arange(bl + 2)
        # token sequence [start, text..., stop] then pad with stop
        toks = jnp.concatenate(
            [jnp.full((b, 1), c.start_text_token, dtype=text_tokens.dtype),
             text_tokens,
             jnp.full((b, 1), c.stop_text_token, dtype=text_tokens.dtype)], axis=1)
        in_range = pos[None, :] < (text_lengths[:, None] + 2)
        # place the stop token right after the text (position len+1)
        is_stop = pos[None, :] == (text_lengths[:, None] + 1)
        toks = jnp.where(is_stop, c.stop_text_token, toks)
        text_emb = self.text_embedding(toks) + self.text_pos_embedding(pos)[None]

        embeds = jnp.concatenate([conds, text_emb], axis=1)
        valid = jnp.concatenate(
            [jnp.ones((b, conds.shape[1]), dtype=bool), in_range], axis=1)
        return embeds, valid

    def prefill(self, prompt_embeds: jnp.ndarray, valid: jnp.ndarray,
                kv_cache: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Run [prompt | start_mel] through the GPT, filling the cache.

        Returns (logits (B, vocab) at the start_mel position, new cache).
        """
        c = self.cfg
        b, p, _ = prompt_embeds.shape
        start = jnp.full((b, 1), c.start_mel_token, dtype=jnp.int32)
        start_emb = self.mel_embedding(start) + self.mel_pos_embedding(
            jnp.zeros((1,), dtype=jnp.int32))[None]
        embeds = jnp.concatenate([prompt_embeds, start_emb], axis=1)
        # int8 QuantKVCache: compute dtype follows the embeds, not the cache
        compute_dtype = (prompt_embeds.dtype if isinstance(kv_cache, tuple)
                         else kv_cache.dtype)
        t_max = (kv_cache[0] if isinstance(kv_cache, tuple)
                 else kv_cache).shape[5]
        valid_all = jnp.concatenate(
            [valid, jnp.ones((b, t_max - p), dtype=bool)], axis=1)
        hidden, cache = self.gpt(embeds.astype(compute_dtype), kv_cache, 0,
                                 valid_all)
        logits = self.mel_head(self.final_norm(hidden[:, -1]).astype(jnp.float32))
        return logits, cache

    def embed_decode_token(self, token: jnp.ndarray,
                           step: jnp.ndarray) -> jnp.ndarray:
        """Token embedding for one AR step: (B,) -> (B, D) (mel position
        step+1, matching `decode_step`)."""
        emb = (self.mel_embedding(token[:, None])
               + self.mel_pos_embedding(step[None, None] + 1))
        return emb[:, 0]

    def embed_decode_token_rows(self, token: jnp.ndarray,
                                steps: jnp.ndarray) -> jnp.ndarray:
        """Per-row AR-step embedding for continuous batching: token (B,),
        steps (B,) last emitted code index per row -> (B, D) with each row's
        own mel position steps+1 (rows decode at different depths)."""
        emb = (self.mel_embedding(token[:, None])
               + self.mel_pos_embedding(steps[:, None] + 1))
        return emb[:, 0]

    def readout(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """final_norm + mel_head on a (B, D) hidden state -> (B, vocab)."""
        return self.mel_head(self.final_norm(hidden).astype(jnp.float32))

    def decode_step(self, token: jnp.ndarray, step: jnp.ndarray,
                    cache_index: jnp.ndarray, valid: jnp.ndarray,
                    kv_cache: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One AR step: token (B,), mel position step+1, cache write at
        cache_index.  Returns (logits (B, vocab), new cache)."""
        emb = (self.mel_embedding(token[:, None])
               + self.mel_pos_embedding(step[None, None] + 1))
        compute_dtype = (emb.dtype if isinstance(kv_cache, tuple)
                         else kv_cache.dtype)
        hidden, cache = self.gpt(emb.astype(compute_dtype), kv_cache,
                                 cache_index, valid)
        logits = self.mel_head(self.final_norm(hidden[:, -1]).astype(jnp.float32))
        return logits, cache
