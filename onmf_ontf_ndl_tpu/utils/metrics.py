"""Metrics tracked by the reference applications."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["surrogate_error", "relative_recon_error",
           "code_covariance"]


def surrogate_error(W: jax.Array, A: jax.Array, B: jax.Array, C: jax.Array):
    """The online-NMF surrogate objective
    ``tr(W A W^T) - 2 tr(W B) + tr(C)``
    (``/root/reference/ising_reconstruction.py:133,164``), computed
    without materializing the d x d products."""
    return (
        jnp.sum((W @ A) * W)
        - 2.0 * jnp.sum(W * B.T)
        + jnp.trace(C)
    )


def relative_recon_error(X: jax.Array, W: jax.Array, H: jax.Array):
    """``|X - W H|_F / |X|_F``."""
    return jnp.linalg.norm(X - W @ H) / jnp.linalg.norm(X)


def code_covariance(code: jax.Array):
    """Trace-normalized covariance of the code matrix rows — the learned
    atoms' co-activation structure (``show_cov``,
    ``/root/reference/network_reconstruction_nx.py:429-442``)."""
    c = code - code.mean(axis=1, keepdims=True)
    n = code.shape[1] - 1
    cov = (c @ c.T) / jnp.maximum(n, 1)
    # constant code (e.g. an all-zero fully-sparse solution) has zero
    # trace; return the zero matrix instead of 0/0 = NaN
    tr = jnp.trace(cov)
    return cov / jnp.where(tr > 0, tr, 1.0)
