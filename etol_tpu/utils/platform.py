"""Platform helpers for TPU images with eager backend registration.

Some TPU environments register a remote backend at interpreter start and
override ``jax_platforms`` via config, so the env var alone cannot force
CPU; and on tunneled backends ``block_until_ready`` can return before
remote work completes, so reliable synchronization needs a host pull.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def force_platform(name: str | None = None) -> None:
    """Re-assert the platform choice (default: the JAX_PLATFORMS env
    var) before backends initialize. Call early, before any jax op."""
    name = name or os.environ.get("JAX_PLATFORMS")
    if name:
        jax.config.update("jax_platforms", name)


def sync(tree) -> None:
    """Completion barrier that works on tunneled backends: pulls one
    scalar per final leaf to the host (block_until_ready can return
    early there)."""
    leaves = [
        x
        for x in jax.tree.leaves(tree)
        if isinstance(x, jax.Array)
    ]
    if leaves:
        x = leaves[-1]
        if jnp.issubdtype(x.dtype, jnp.inexact) or jnp.issubdtype(
            x.dtype, jnp.integer
        ):
            float(jnp.sum(x.astype(jnp.float32)))
        else:
            bool(jnp.all(x))
