"""Data-parallel online NMF over a device mesh.

The reference is strictly single-process NumPy (SURVEY.md §2: no
parallelism of any kind). The online-NMF aggregates are *linear* in the
batch samples — ``A`` accumulates ``H H^T`` and ``B`` accumulates
``H X^T`` (``/root/reference/src/onmf.py:155-158``) — which makes the
algorithm exactly data-parallel: shard the patch batch over the ``dp``
mesh axis, sparse-code locally (columns of H are independent given W),
``psum`` the per-shard statistics, and run the identical dictionary
update on every device. The DP result equals the single-device result on
the concatenated batch, which the tests assert on a virtual 8-device CPU
mesh.

Collectives ride the ICI via XLA ``psum`` inside ``shard_map``; W and the
aggregates are replicated, only patch data is sharded.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from onmf_ontf_ndl_tpu.models.state import OnmfState
from onmf_ontf_ndl_tpu.ops.coder import _code_impl
from onmf_ontf_ndl_tpu.ops.dict_update import dict_update_bcd

__all__ = ["dp_onmf_step", "dp_train_dict", "shard_batch"]


def shard_batch(mesh: Mesh, X: jax.Array, axis: str = "dp") -> jax.Array:
    """Place a (d, n) batch with columns sharded over the mesh axis."""
    return jax.device_put(X, NamedSharding(mesh, P(None, axis)))


def _local_step(st: OnmfState, X, t, H0, stopping_diff, *, alpha, beta,
                sub_iter, use_stopping, dict_from, axis):
    """Per-shard step body: local coding, global (psum) aggregates,
    replicated dictionary update."""
    W, A, B, C = st.W, st.A, st.B, st.C
    gram = W.T @ W
    proj = W.T @ X
    H = _code_impl(gram, proj, H0, jnp.asarray(alpha, W.dtype),
                   stopping_diff, jnp.asarray(0.0, W.dtype),
                   sub_iter, use_stopping, False)
    hht = lax.psum(H @ H.T, axis)
    hxt = lax.psum(H @ X.T, axis)
    w_t = t ** (-jnp.asarray(beta, W.dtype))
    A1 = (1.0 - w_t) * A + w_t * hht
    B1 = (1.0 - w_t) * B + w_t * hxt
    if st.tracks_xxt:
        C1 = (1.0 - w_t) * C + w_t * lax.psum(X @ X.T, axis)
    else:
        C1 = C
    W1 = dict_update_bcd(W, A, B) if dict_from == "stale" \
        else dict_update_bcd(W, A1, B1)
    return dataclasses.replace(st, W=W1, A=A1, B=B1, C=C1, t=t), H


def dp_onmf_step(
    mesh: Mesh,
    state: OnmfState,
    X: jax.Array,
    t=None,
    *,
    H0: jax.Array | None = None,
    alpha: float = 0.0,
    beta: float = 1.0,
    sub_iter: int = 10,
    stopping_diff: float | None = None,
    dict_from: str = "stale",
    axis: str = "dp",
):
    """One data-parallel online-NMF step.

    ``X`` (d, n) is column-sharded over ``axis``; ``H0`` (r, n) likewise
    (drawn from the state key when omitted). State is replicated. Returns
    (state, H) with H column-sharded.

    With ``stopping_diff=None`` (fixed ``sub_iter`` sweeps, the default
    here) the DP step is numerically identical to the single-device step
    on the concatenated batch. With early stopping the coder's stopping
    rule becomes shard-local (each shard's relative-change test sees only
    its columns) — semantically a per-shard variant of the batched rule.
    """
    if t is None:
        t = state.t + 1.0
    t = jnp.asarray(t, state.W.dtype)
    if H0 is None:
        key, hkey = jax.random.split(state.key)
        state = dataclasses.replace(state, key=key)
        H0 = jax.random.uniform(hkey, (state.r, X.shape[1]),
                                dtype=state.W.dtype)
        H0 = shard_batch(mesh, H0, axis)

    use_stopping = stopping_diff is not None
    sd = jnp.asarray(stopping_diff if use_stopping else 0.0, state.W.dtype)

    step = shard_map(
        functools.partial(
            _local_step, alpha=alpha, beta=beta, sub_iter=int(sub_iter),
            use_stopping=use_stopping, dict_from=dict_from, axis=axis),
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(), P(None, axis), P()),
        out_specs=(P(), P(None, axis)),
        check_vma=False,
    )
    return jax.jit(step)(state, X, t, H0, sd)


def dp_train_dict(
    mesh: Mesh,
    state: OnmfState,
    X: jax.Array,
    *,
    iterations: int,
    batch_size_per_device: int,
    alpha: float = 0.0,
    beta: float = 1.0,
    sub_iter: int = 10,
    dict_from: str = "stale",
    axis: str = "dp",
):
    """Data-parallel ``train_dict``: every device subsamples its own
    ``batch_size_per_device`` columns from the (replicated or sharded)
    data each iteration; aggregate statistics are psum'd. The global
    effective batch is ``batch_size_per_device * mesh.shape[axis]``.

    Returns the final replicated state.
    """
    ndev = mesh.shape[axis]
    n = X.shape[1]

    def local_train(st: OnmfState, X_local):
        me = lax.axis_index(axis)
        t0 = st.t

        def body(carry, i):
            st = carry
            key, skey, hkey = jax.random.split(
                jax.random.fold_in(st.key, i), 3)
            skey = jax.random.fold_in(skey, me)
            hkey = jax.random.fold_in(hkey, me)
            idx = jax.random.randint(skey, (batch_size_per_device,), 0,
                                     X_local.shape[1])
            Xb = jnp.take(X_local, idx, axis=1)
            H0 = jax.random.uniform(hkey, (st.r, batch_size_per_device),
                                    dtype=Xb.dtype)
            st, _ = _local_step(
                st, Xb, t0 + jnp.asarray(i, Xb.dtype), H0,
                jnp.asarray(0.0, Xb.dtype), alpha=alpha, beta=beta,
                sub_iter=int(sub_iter), use_stopping=False,
                dict_from=dict_from, axis=axis)
            st = dataclasses.replace(st, key=key)
            return st, None

        st, _ = lax.scan(body, st, jnp.arange(1, max(iterations, 1)))
        if iterations > 1:
            st = dataclasses.replace(
                st, t=t0 + jnp.asarray(iterations, X_local.dtype))
        return st

    if n % ndev != 0:
        raise ValueError(
            f"dp_train_dict: data columns ({n}) must divide evenly over "
            f"the {ndev}-way '{axis}' mesh axis")
    train = shard_map(
        local_train,
        mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(train)(state, shard_batch(mesh, X, axis))


def dp_train_image_dict(
    mesh: Mesh,
    state: OnmfState,
    img: jax.Array,
    *,
    outer_iterations: int,
    num_patches_per_device: int,
    inner_iterations: int,
    batch_size_per_device: int,
    patch_size: int,
    alpha: float = 0.0,
    beta: float = 1.0,
    sub_iter: int = 10,
    dict_from: str = "stale",
    axis: str = "dp",
):
    """Data-parallel fused image trainer: every device samples its own
    random patches from the (replicated) image and runs the inner online
    steps with psum'd aggregate statistics — the multi-chip version of
    :func:`onmf_ontf_ndl_tpu.apps.image.train_image_dict`. The global
    effective batch per step is ``batch_size_per_device * ndev``.
    """
    from onmf_ontf_ndl_tpu.ops.patches import (
        extract_patches, random_patch_corners)

    k = patch_size

    def local_train(st: OnmfState, img):
        me = lax.axis_index(axis)
        t0 = st.t

        def outer(carry, o):
            st = carry
            key, pkey, ikey = jax.random.split(
                jax.random.fold_in(st.key, o), 3)
            pkey = jax.random.fold_in(pkey, me)
            corners = random_patch_corners(pkey, img.shape[:2], k,
                                           num_patches_per_device)
            X = extract_patches(img, corners, k)

            def inner(st, i):
                skey, hkey = jax.random.split(
                    jax.random.fold_in(jax.random.fold_in(ikey, i), me))
                idx = jax.random.randint(
                    skey, (batch_size_per_device,), 0, X.shape[1])
                Xb = jnp.take(X, idx, axis=1)
                H0 = jax.random.uniform(
                    hkey, (st.r, batch_size_per_device), dtype=Xb.dtype)
                st, _ = _local_step(
                    st, Xb, st.t + 1.0, H0, jnp.asarray(0.0, Xb.dtype),
                    alpha=alpha, beta=beta, sub_iter=int(sub_iter),
                    use_stopping=False, dict_from=dict_from, axis=axis)
                return st, None

            st, _ = lax.scan(inner, st, jnp.arange(1, max(inner_iterations, 1)))
            if inner_iterations > 1:
                st = dataclasses.replace(
                    st, t=st.t + 1.0)  # reference history gap per run
            st = dataclasses.replace(st, key=key)
            return st, None

        st, _ = lax.scan(outer, st, jnp.arange(outer_iterations))
        return st

    train = shard_map(
        local_train, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(train)(state, img)
