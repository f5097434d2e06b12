"""Numerical-health checks (the sanitizer analogue for this framework).

SURVEY.md §5: the reference has no race detection/sanitizers (single
threaded); the meaningful equivalent here is NaN/Inf surveillance and
state-invariant validation for the optimizer pytree.
"""

from __future__ import annotations

import contextlib

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["check_state", "debug_nans"]


def check_state(state, *, name: str = "state") -> None:
    """Validate the optimizer-state invariants on the host; raises
    ``FloatingPointError`` with a precise description on violation.

    Invariants (``/root/reference/src/onmf.py:113-114`` projections):
    all fields finite; W >= 0; dictionary columns within the unit ball;
    A symmetric PSD-diagonal (non-negative diagonal).
    """
    problems = []
    for field in ("W", "A", "B", "C", "t"):
        arr = np.asarray(getattr(state, field))
        if arr.size and not np.isfinite(arr).all():
            problems.append(f"{field} contains non-finite values")
    W = np.asarray(state.W)
    if (W < 0).any():
        problems.append("W has negative entries")
    norms = np.linalg.norm(W, axis=0)
    if (norms > 1 + 1e-4).any():
        problems.append(f"W column norm exceeds 1 (max {norms.max():.6f})")
    A = np.asarray(state.A)
    if A.size and (np.diag(A) < -1e-6).any():
        problems.append("A has negative diagonal entries")
    if A.size and not np.allclose(A, A.T, rtol=1e-5, atol=1e-6):
        problems.append("A is not symmetric")
    if problems:
        raise FloatingPointError(f"{name}: " + "; ".join(problems))


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Enable jax's NaN debugging (errors at the op that produced a NaN)
    for the enclosed block."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", bool(enable))
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
