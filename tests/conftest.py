"""Test harness: force CPU with 8 virtual devices (multi-chip mesh simulation).

The session may expose a real TPU through the experimental `axon` plugin,
which ignores the JAX_PLATFORMS env var — so we force the platform through
jax.config before any backend is initialized.  Must run before any test module
imports jax-dependent code.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache for the suite.  The history (VERDICT r1 weak
# #1 + round-2 repro): sharing .jax_cache with TPU-AOT bench entries
# segfaulted on read; a CPU-only cache dir then segfaulted inside
# compilation_cache.put_executable_and_time on WRITE — this jax build's
# XLA:CPU AOT serialization itself is unsafe (its loader also warns that the
# compile-machine features mismatch the host, "could lead to ... SIGILL").
# Correct CI signal beats compile reuse: run cacheless.
jax.config.update("jax_enable_compilation_cache", False)
assert jax.default_backend() == "cpu"
assert jax.device_count() == 8


# ---------------------------------------------------------------------------
# test tiers: modules dominated by interpret-mode Pallas sweeps or 8-device
# mesh simulation are auto-marked `slow` (deselected by default via addopts;
# run with `pytest tests/ -m slow`).  Per-test opt-outs: a test in a slow
# module can stay in the CI tier via @pytest.mark.ci_tier.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

_SLOW_MODULES = {
    "test_parallel",          # 8-device mesh sims, dp x tp training steps
    "test_fused_decode",      # interpret-mode megakernel sweeps
    "test_continuous",        # interpret-mode continuous batching
    "test_pipeline_parity",   # chained decode->s2mel->vocoder parity
    # e2e tiny-engine suites: each test compiles a fresh stage-graph set on
    # 1 CPU (2-6 min apiece — measured r3 CI run: 64 min total).  A
    # representative core stays in the CI tier via @pytest.mark.ci_tier
    "test_engine",
    "test_serving",
    "test_fused_vocoder",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__ in _SLOW_MODULES
                and "ci_tier" not in item.keywords):
            item.add_marker(pytest.mark.slow)
