"""Attic: correctness-tested kernels that LOST their on-chip A/Bs.

Kept as engineering record with their measured negative results (VERDICT r3
item 9: "prune or demote to an attic module") — each is wired behind a
default-off config flag and unit-tested, but is NOT part of the shipping
fast path:

- `dit_blocks`: whole-DiT-trunk Pallas megakernel.  Measured ~2x SLOWER
  than XLA at serving shapes (velocity 3.88 vs 2.23 ms; CFM solve 91 vs
  47 ms on v5e) — XLA is already near-roofline at (T~704, 512) and the
  kernel's 64-lane per-head attention dots cost more than the saved
  activation traffic.  Flag: `DiTConfig.fused_blocks`.
- `cfm_attention`: whole-sequence VMEM attention for the DiT.  Measured
  SLOWER than the XLA einsum at serving shapes (25-step CFM 62.5 vs
  46.8 ms) — XLA's fused attention already keeps the 16 MB score block
  on-chip.  Flag: `DiTConfig.fused_attention` (kept for long-T configs).
- `fused_vocoder`: per-stage Pallas resblock kernels for the late BigVGAN
  stages.  Mosaic compile exceeds a 420 s budget at serving tile sizes
  (~2000 unrolled lane-roll ops) — known-infeasible on current Mosaic;
  the 4 compile-gate cases are in the gate's skip list with this reason.
  Flag: `EngineConfig.use_fused_vocoder`.

The measured-slower GROUPED-conv vocoder packing (`use_packed_vocoder`)
stays in `models/vocoder/packed.py` because the live shared-activation
variant shares its packing helpers.
"""
