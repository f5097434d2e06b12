"""The online-NMF state pytree.

The reference threads its warm-start state across freshly constructed
``Online_NMF`` objects via constructor kwargs ``ini_dict / ini_A / ini_B /
ini_C / history`` (``/root/reference/src/onmf.py:22-32``, used e.g. at
``/root/reference/image_reconstruction.py:289-312``). Here that state is a
single immutable pytree that flows through jitted functions, ``lax.scan``
loops, shard_map data parallelism, and checkpointing alike.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["OnmfState", "init_state"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OnmfState:
    """Full state of the online NMF optimizer.

    Attributes:
      W: (d, r) dictionary, nonnegative, columns in the unit L2 ball.
      A: (r, r) streaming aggregate of the code second moment H H^T.
      B: (r, d) streaming aggregate of the code-data cross moment H X^T.
      C: (d, d) streaming aggregate of the data second moment X X^T, or a
         (0, 0) placeholder when not tracked. (Only the Ising trajectory
         application tracks C, for the surrogate error
         tr(W A W^T) - 2 tr(W B) + tr(C);
         ``/root/reference/ising_reconstruction.py:133``.)
      t: scalar float iteration counter ("history"); drives the t^-beta
         step-weight schedule so checkpoint-resume continues the schedule
         exactly.
      key: PRNG key for minibatch subsampling and code initialization.
    """

    W: jax.Array
    A: jax.Array
    B: jax.Array
    C: jax.Array
    t: jax.Array
    key: jax.Array

    @property
    def d(self) -> int:
        return self.W.shape[0]

    @property
    def r(self) -> int:
        return self.W.shape[1]

    @property
    def tracks_xxt(self) -> bool:
        return self.C.size > 0


def init_state(
    key: jax.Array,
    d: int,
    r: int,
    *,
    track_xxt: bool = False,
    dtype=jnp.float32,
    W: jax.Array | None = None,
    A: jax.Array | None = None,
    B: jax.Array | None = None,
    C: jax.Array | None = None,
    t: float = 0.0,
) -> OnmfState:
    """Create a fresh (or warm-started) optimizer state.

    With no warm-start arrays this matches the reference's cold start:
    uniform-random W, zero aggregates
    (``/root/reference/src/onmf.py:187-197``).
    """
    key, wkey = jax.random.split(key)
    # validate warm-start shapes HERE: a mismatch (e.g. a lower-rank
    # ini_dict with a higher n_components) would otherwise surface as an
    # opaque XLA shape error deep inside the jitted training scan
    for name, arr, want in (("W", W, (d, r)), ("A", A, (r, r)),
                            ("B", B, (r, d)),
                            ("C", C, (d, d) if track_xxt else None)):
        if arr is not None and want is not None \
                and tuple(jnp.shape(arr)) != want:
            raise ValueError(
                f"init_state: {name} has shape {tuple(jnp.shape(arr))}, "
                f"expected {want} for d={d}, r={r}")
    if W is None:
        W = jax.random.uniform(wkey, (d, r), dtype=dtype)
    else:
        W = jnp.asarray(W, dtype)
    A = jnp.zeros((r, r), dtype) if A is None else jnp.asarray(A, dtype)
    B = jnp.zeros((r, d), dtype) if B is None else jnp.asarray(B, dtype)
    if C is None:
        C = jnp.zeros((d, d) if track_xxt else (0, 0), dtype)
    else:
        C = jnp.asarray(C, dtype)
    return OnmfState(W=W, A=A, B=B, C=C, t=jnp.asarray(t, dtype), key=key)
