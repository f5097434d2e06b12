"""Tensor matricization (mode-``i`` unfolding).

Matches tensorly's ``unfold`` convention used by the reference ONTF
(``/root/reference/src/ontf.py:203-208``): move the unfolding mode to the
front and flatten the remaining axes row-major, i.e.
``unfold(X, m) = moveaxis(X, m, 0).reshape(X.shape[m], -1)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["unfold", "fold"]


def unfold(X: jax.Array, mode: int) -> jax.Array:
    """Mode-``mode`` unfolding of a tensor into a matrix."""
    mode = mode % X.ndim                       # normalize negative modes
    return jnp.moveaxis(X, mode, 0).reshape(X.shape[mode], -1)


def fold(M: jax.Array, mode: int, shape: tuple[int, ...]) -> jax.Array:
    """Inverse of :func:`unfold` for a tensor of the given full shape."""
    mode = mode % len(shape)                   # normalize negative modes
    lead = (shape[mode],) + tuple(s for i, s in enumerate(shape) if i != mode)
    return jnp.moveaxis(M.reshape(lead), 0, mode)
