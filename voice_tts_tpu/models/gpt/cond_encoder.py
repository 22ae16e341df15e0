"""Attention-block conditioning encoder — the reference's `condition_type=
"perceiver"` branch (the `UnifiedVoice` ctor DEFAULT, `model_v2.py:310,349-350`).

Reference modules: `ConditioningEncoder` (`model_v2.py:215-239`) = Conv1d
(spec_dim -> D, k=1) followed by 6 `AttentionBlock`s (`utils/arch_util.py:77-120`),
each GroupNorm -> qkv Conv1d(k=1) -> `QKVAttentionLegacy` (`arch_util.py:41-75`)
-> zero-init proj Conv1d(k=1) -> residual.  The IndexTTS-2 published config
selects `conformer_perceiver` instead, but the ctor default means a custom
`config.yaml` can reach this branch, so conversion must not fail on it.

Two reference branches are NOT implemented because they are broken in the
reference itself and therefore no checkpoint can exist for them:
- `gst`: `get_conditioning` reads `self.gst_encoder` (`model_v2.py:530`) but
  the ctor never creates that attribute (`model_v2.py:349-366`) -> AttributeError.
- `conformer_encoder`: falls into the `else` arm of `get_conditioning`
  (`model_v2.py:533-541`), which calls the ConformerEncoder with one
  positional arg while its forward needs (xs, xs_lens) -> TypeError.
`UnifiedVoice.setup` raises a ValueError naming this evidence if selected.

Layout notes: torch-layout (B, C, T) internally so the checkpoint converter
stays a pure rename; attention runs as batched einsums on the MXU with f32
softmax (matching `arch_util.py:67`: `softmax(weight.float())`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from voice_tts_tpu.models.layers import Conv1d, GroupNorm


def _norm_groups(channels: int) -> int:
    """Reference `arch_util.normalization` group count (`arch_util.py:29-38`):
    32 for wide layers, fewer for narrow ones, halved until divisible."""
    groups = 32
    if channels <= 16:
        groups = 8
    elif channels <= 64:
        groups = 16
    while channels % groups != 0:
        groups = int(groups / 2)
    assert groups > 2
    return groups


class AttentionBlock(nn.Module):
    """Residual self-attention block (`utils/arch_util.py:77-120`).

    x (B, C, T) -> (B, C, T).  Head layout matches `QKVAttentionLegacy`
    (`arch_util.py:41-75`): the qkv conv's 3C output channels are grouped
    HEAD-MAJOR — head h owns channels [3*ch*h, 3*ch*(h+1)) split [q|k|v] —
    and q, k are each pre-scaled by ch**-0.25 before the dot (f16-stable
    split of the 1/sqrt(ch) softmax scale, `arch_util.py:61`)."""

    channels: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, c, t = x.shape
        h, ch = self.num_heads, c // self.num_heads
        xn = GroupNorm(_norm_groups(c), name="norm")(x)
        qkv = Conv1d(3 * c, 1, name="qkv")(xn)        # (B, 3C, T)
        qkv = qkv.reshape(b, h, 3 * ch, t)
        q, k, v = qkv[:, :, :ch], qkv[:, :, ch:2 * ch], qkv[:, :, 2 * ch:]
        scale = ch ** -0.25
        w = jnp.einsum("bhct,bhcs->bhts", q * scale, k * scale)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(x.dtype)
        a = jnp.einsum("bhts,bhcs->bhct", w, v).reshape(b, c, t)
        return x + Conv1d(c, 1, name="proj_out")(a)


class AttentionConditioningEncoder(nn.Module):
    """`ConditioningEncoder` (`model_v2.py:215-239`): Conv1d(k=1) stem +
    `attn_blocks` AttentionBlocks.  x (B, T, spec_dim) -> (B, T, dim)
    ((B, C, T) torch layout internally); `mean=True` returns (B, dim) —
    the reference's default-encoder branch (`model_v2.py:237`)."""

    dim: int
    num_heads: int
    attn_blocks: int = 6
    mean: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = Conv1d(self.dim, 1, name="init")(jnp.swapaxes(x, 1, 2))
        for i in range(self.attn_blocks):
            h = AttentionBlock(self.dim, self.num_heads, name=f"attn_{i}")(h)
        if self.mean:
            return jnp.mean(h, axis=2)
        return jnp.swapaxes(h, 1, 2)
