"""Checkpoint / resume for the optimizer state.

The reference persists ad-hoc ``np.save`` arrays and threads warm-start
kwargs in memory (``/root/reference/image_reconstruction.py:318-319``,
``network_reconstruction_nx.py:386-389,581-584``; SURVEY.md §5). Here the
FULL :class:`OnmfState` pytree — dictionary, all aggregates, the step
counter, and the PRNG key — round-trips through one ``.npz`` file, so a
resumed run continues the ``t^-beta`` schedule and the random stream
exactly where it stopped.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from onmf_ontf_ndl_tpu.models.state import OnmfState

__all__ = ["save_state", "load_state", "checkpoint_exists"]


def _norm_path(path: str) -> str:
    """np.savez appends '.npz' to suffix-less paths; normalize up front
    so save/load/exists all agree on the on-disk name."""
    return path if str(path).endswith(".npz") else str(path) + ".npz"


def checkpoint_exists(path: str) -> bool:
    """Whether a checkpoint written by :func:`save_state` exists."""
    import os

    return os.path.exists(_norm_path(path))


def save_state(path: str, state: OnmfState, extra: dict | None = None) -> None:
    """Serialize an OnmfState (plus optional named auxiliary arrays —
    e.g. an app's MCMC chain embedding or accumulated code matrix) to a
    ``.npz`` file (the suffix is appended when missing — np.savez does
    so anyway; normalizing keeps load/exists consistent)."""
    path = _norm_path(path)
    arrays = dict(
        W=np.asarray(state.W),
        A=np.asarray(state.A),
        B=np.asarray(state.B),
        C=np.asarray(state.C),
        t=np.asarray(state.t),
        key_data=np.asarray(jax.random.key_data(state.key)),
        key_impl=np.bytes_(
            str(jax.random.key_impl(state.key)).encode()),
    )
    for name, value in (extra or {}).items():
        arrays["extra_" + name] = np.asarray(value)
    np.savez(path, **arrays)


def load_state(path: str, dtype=None, with_extra: bool = False):
    """Restore an OnmfState saved by :func:`save_state`.

    ``with_extra=True`` additionally returns the dict of auxiliary
    arrays saved alongside (empty for checkpoints without them; their
    saved dtypes are preserved — ``dtype`` only recasts the optimizer
    arrays)."""
    with np.load(_norm_path(path)) as z:
        W = z["W"]
        cast = (lambda a: jnp.asarray(a, dtype)) if dtype else jnp.asarray
        impl = str(np.asarray(z["key_impl"]).item())
        if impl.startswith("b'"):  # bytes repr round-trip
            impl = impl[2:-1]
        key = jax.random.wrap_key_data(jnp.asarray(z["key_data"]),
                                       impl=impl)
        state = OnmfState(
            W=cast(W), A=cast(z["A"]), B=cast(z["B"]), C=cast(z["C"]),
            t=cast(z["t"]), key=key,
        )
        if with_extra:
            # extras keep their SAVED dtypes (int embeddings, bool
            # masks, ...) — the float recast is for optimizer arrays only
            extra = {name[len("extra_"):]: jnp.asarray(z[name])
                     for name in z.files if name.startswith("extra_")}
            return state, extra
        return state
