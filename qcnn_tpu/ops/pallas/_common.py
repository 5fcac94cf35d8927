"""Shared helpers for the Pallas kernel package."""

from __future__ import annotations

import jax


def ceil_to(x: int, m: int) -> int:
    """Round x up to a multiple of m."""
    return -(-x // m) * m


def auto_interpret(interpret: bool | None) -> bool:
    """Default Pallas interpret mode: interpreter off-TPU, compiled on."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret
