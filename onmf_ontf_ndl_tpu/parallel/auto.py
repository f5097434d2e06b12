"""GSPMD-style automatic parallelism.

The complement to the explicit ``shard_map`` layer in ``parallel/dp.py``:
annotate shardings on the inputs and let XLA's SPMD partitioner insert
the collectives. Useful when mixing axes (e.g. batch over ``dp`` AND
dictionary columns over ``tp``) without writing per-axis communication.
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from onmf_ontf_ndl_tpu.models.state import OnmfState

__all__ = ["shard_state", "auto_train_dict"]


def shard_state(mesh: Mesh, state: OnmfState, *,
                tp_axis: str | None = None) -> OnmfState:
    """Place the state on the mesh: replicated by default; with
    ``tp_axis`` the dictionary columns and the matching B rows are
    sharded over that axis (A stays replicated — it is only r x r and is
    consumed whole by every column update)."""
    rep = NamedSharding(mesh, P())
    if tp_axis is None:
        put = lambda x: jax.device_put(x, rep)
        return dataclasses.replace(
            state, W=put(state.W), A=put(state.A), B=put(state.B),
            C=put(state.C), t=put(state.t), key=put(state.key))
    return dataclasses.replace(
        state,
        W=jax.device_put(state.W, NamedSharding(mesh, P(None, tp_axis))),
        A=jax.device_put(state.A, rep),
        B=jax.device_put(state.B, NamedSharding(mesh, P(tp_axis, None))),
        C=jax.device_put(state.C, rep),
        t=jax.device_put(state.t, rep),
        key=jax.device_put(state.key, rep),
    )


def auto_train_dict(mesh: Mesh, state: OnmfState, X, *,
                    dp_axis: str = "dp", tp_axis: str | None = None,
                    **train_kwargs):
    """Run :func:`onmf_ontf_ndl_tpu.models.onmf.train_dict` under GSPMD:
    the data columns are sharded over ``dp_axis`` (and the dictionary
    optionally over ``tp_axis``); XLA inserts the all-reduces for the
    aggregate statistics and the all-gathers for W^T W.

    Semantically identical to the single-device ``train_dict`` — the
    partitioner only changes the execution layout.
    """
    from onmf_ontf_ndl_tpu.models.onmf import train_dict

    X = jax.device_put(X, NamedSharding(mesh, P(None, dp_axis)))
    state = shard_state(mesh, state, tp_axis=tp_axis)
    return train_dict(state, X, **train_kwargs)
