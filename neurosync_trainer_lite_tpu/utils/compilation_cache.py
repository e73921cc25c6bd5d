"""Persistent XLA compilation cache for deployments.

The serving programs (bucketed frontend, session ticks, the 228M decode)
compile once per shape bucket; a warmup walks all of them, which is
minutes of XLA time per PROCESS. JAX's persistent compilation cache makes
that one-time per MACHINE: compiled executables serialize to disk and
later processes deserialize instead of recompiling. Measured through this
rig's axon tunnel: the 228M decode compile drops 31.1 s (cold) → 11.9 s
(warm cache — deserialize + device load); the cache survives process
restarts, so a crashed/redeployed server warms from disk.

Enabled by default by the CLI entry points (server, trainer, bench) —
library users opt in by calling enable_persistent_cache() before any jit
executes. Set NEUROSYNC_XLA_CACHE to relocate it, or to "0"/"off" to
disable.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "neurosync_tpu", "xla")


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Must run before the first compilation (ideally before any device op).
    Returns the directory used, or None when disabled via env.
    """
    env = os.environ.get("NEUROSYNC_XLA_CACHE", "")
    if env.lower() in ("0", "off", "none"):
        return None
    path = cache_dir or env or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # only persist compilations worth the disk round-trip
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
