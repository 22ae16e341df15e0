"""Conditional flow matching: Euler ODE solve with classifier-free guidance.

Parity with reference `s2mel/modules/flow_matching.py:31-115`: noise init,
prompt-region pinning to zero, uniform `t_span`, per-step CFG via a stacked
[real; null] batch, `(1+r)*v - r*v_null`, re-zero of the prompt region after
every step.  The 25-step loop is a `lax.scan` over one jitted DiT step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cfm_inference(dit_apply, params, mu: jnp.ndarray, x_len: jnp.ndarray,
                  prompt: jnp.ndarray, prompt_len: jnp.ndarray,
                  style: jnp.ndarray, rng: Optional[jax.Array], n_steps: int,
                  cfg_rate: float, temperature: float = 1.0,
                  noise: Optional[jnp.ndarray] = None,
                  tables=None, unroll: int = 1) -> jnp.ndarray:
    """mu (B, T, D) regulated condition; prompt (B, 80, T) mel with the
    reference mel placed at [:prompt_len] (already zero elsewhere);
    x_len (B,) total valid frames.  Returns mel (B, 80, T).

    `noise` overrides the random init (deterministic parity tests).
    `tables` (optional): `DiT.step_tables(t_span[:-1])` pytree with leading
    axis n_steps — the scan slices it per step and `dit_apply` must accept
    and forward the extra per-step slice, which skips the timestep
    projections inside the scan body (they are batched once up front).
    """
    b, t, _ = mu.shape
    n_mels = prompt.shape[1]
    if noise is not None:
        z = noise * temperature
    else:
        z = jax.random.normal(rng, (b, n_mels, t)) * temperature

    frame = jnp.arange(t)
    prompt_mask = (frame[None, :] < prompt_len[:, None])[:, None, :]  # (B,1,T)
    x = jnp.where(prompt_mask, 0.0, z)

    t_span = jnp.linspace(0.0, 1.0, n_steps + 1)

    def step(x, inp):
        i, tab = inp
        t_cur = t_span[i]
        dt = t_span[i + 1] - t_span[i]
        if cfg_rate > 0:
            x2 = jnp.concatenate([x, x], axis=0)
            p2 = jnp.concatenate([prompt, jnp.zeros_like(prompt)], axis=0)
            s2 = jnp.concatenate([style, jnp.zeros_like(style)], axis=0)
            m2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
            l2 = jnp.concatenate([x_len, x_len], axis=0)
            t2 = jnp.full((2 * b,), t_cur)
            v2 = dit_apply(params, x2, p2, l2, t2, s2, m2, tab)
            v, v_null = jnp.split(v2, 2, axis=0)
            v = (1.0 + cfg_rate) * v - cfg_rate * v_null
        else:
            v = dit_apply(params, x, prompt, x_len, jnp.full((b,), t_cur),
                          style, mu, tab)
        x = x + dt * v
        x = jnp.where(prompt_mask, 0.0, x)
        return x, None

    # `unroll>1` places several Euler steps in one compiled loop body —
    # identical numerics (the steps stay strictly sequential), but XLA
    # schedules across step boundaries and the per-iteration loop
    # overhead amortizes (EngineConfig.cfm_unroll; A/B via CFM_UNROLL)
    x, _ = jax.lax.scan(step, x, (jnp.arange(n_steps), tables),
                        unroll=min(unroll, n_steps) if unroll > 1 else 1)
    return x
