"""Saturating colour algebra on (..., 3) float arrays.

Semantics mirror shared/colour/colour.go:
  sat_add   — per-channel add clamped at 1.0 (colour.go:38-41)
  sat_scale — scalar multiply clamped to [0, 1] (colour.go:43-46)
  multiply  — componentwise product, unclamped (colour.go:48-51)
  to_u8     — truncating conversion to 8-bit, uint8(255 * c) (colour.go:59-61)

Note: because all shading contributions are non-negative and only the upper
clamp can engage, a chain of sat_adds equals a single clamp of the sum:
min(a + b + ..., 1). The shading path exploits this to vectorize.
"""

from __future__ import annotations

import jax.numpy as jnp


def sat_add(a, b):
    return jnp.minimum(a + b, 1.0)


def sat_scale(a, s):
    return jnp.clip(s * a, 0.0, 1.0)


def multiply(a, b):
    return a * b


def to_u8(c):
    """uint8(255 * channel) with truncation, as in colour.go:59-61. Inputs are
    clipped defensively (the Go code relies on [0,1] by construction)."""
    return (255.0 * jnp.clip(c, 0.0, 1.0)).astype(jnp.uint8)
