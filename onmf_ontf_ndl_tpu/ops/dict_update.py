"""Dictionary update by column-wise block coordinate descent.

Given the streaming sufficient statistics ``A = aggregate of H H^T`` (r, r)
and ``B = aggregate of H X^T`` (r, d), performs one Gauss-Seidel pass over
the r columns of ``W`` (d, r):

    W[:, j] <- W[:, j] - (W @ A[:, j] - B[j, :]) / (A[j, j] + 1)
    W[:, j] <- max(W[:, j], 0)                      (nonnegativity)
    W[:, j] <- W[:, j] / max(1, |W[:, j]|_2)        (unit-ball projection)

Semantics match ``Online_NMF.update_dict`` in the reference
(``/root/reference/src/onmf.py:92-116``; duplicated at
``/root/reference/src/ontf.py:91-115``) — including the sequential column
order, which matters because later columns see already-updated earlier
columns through the ``W @ A[:, j]`` term.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["dict_update_bcd"]


def dict_update_bcd(W: jax.Array, A: jax.Array, B: jax.Array) -> jax.Array:
    """One BCD pass updating all columns of the dictionary.

    Args:
      W: (d, r) current dictionary.
      A: (r, r) code second-moment aggregate.
      B: (r, d) code-data cross-moment aggregate.

    Returns:
      (d, r) updated dictionary with nonnegative, norm<=1 columns.
    """
    r = W.shape[1]

    def col_update(j, W):
        grad = W @ A[:, j] - B[j, :]
        col = W[:, j] - grad / (A[j, j] + 1.0)
        col = jnp.maximum(col, 0.0)
        col = col / jnp.maximum(1.0, jnp.linalg.norm(col))
        return W.at[:, j].set(col)

    return lax.fori_loop(0, r, col_update, W)
