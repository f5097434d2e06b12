"""Randomized shape/config fuzz of the fused kernels vs the XLA paths.

The targeted parity tests in ``test_pallas_kernels.py``/``test_fista.py``
pin a few shapes; this sweeps a seeded grid of ranks (padded and
unpadded), widths (single- and multi-tile), block_rows, alphas, and
sweep counts through interpret mode and asserts agreement with the XLA
reference implementations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from onmf_ontf_ndl_tpu.ops.coder import _code_impl, _fista_impl
from onmf_ontf_ndl_tpu.ops.dict_update import dict_update_bcd
from onmf_ontf_ndl_tpu.ops.pallas.coder_kernel import (
    coder_sweeps,
    dict_update_sweep,
    fista_sweeps,
)

CASES = [
    # (r, n, alpha, sub_iter, block_rows)
    (3, 50, 0.0, 3, 1),
    (5, 128, 1.5, 7, 2),
    (8, 513, 0.3, 10, 3),
    (16, 200, 0.0, 5, 4),
    (25, 1000, 2.0, 10, 2),
    (33, 260, 0.7, 6, 5),
    (64, 700, 0.1, 4, 8),
]


@pytest.mark.parametrize("r,n,alpha,sub_iter,bk", CASES)
def test_coder_kernel_fuzz(r, n, alpha, sub_iter, bk):
    rng = np.random.default_rng(r * 1000 + n)
    W = rng.random((r * 3 + 7, r)).astype(np.float32)
    X = rng.random((W.shape[0], n)).astype(np.float32)
    H0 = rng.random((r, n)).astype(np.float32)
    A = jnp.asarray(W.T @ W)
    B = jnp.asarray(W.T @ X)
    want = _code_impl(A, B, jnp.asarray(H0), jnp.float32(alpha),
                      jnp.float32(0.0), jnp.float32(0.0), sub_iter,
                      False, False)
    got = coder_sweeps(A, B, jnp.asarray(H0), alpha, sub_iter=sub_iter,
                       block_rows=bk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("r,n,alpha,sub_iter,bk", CASES[:4])
def test_fista_kernel_fuzz(r, n, alpha, sub_iter, bk):
    rng = np.random.default_rng(r * 77 + n)
    W = rng.random((r * 2 + 5, r)).astype(np.float32)
    X = rng.random((W.shape[0], n)).astype(np.float32)
    H0 = rng.random((r, n)).astype(np.float32)
    A = jnp.asarray(W.T @ W)
    B = jnp.asarray(W.T @ X)
    want = _fista_impl(A, B, jnp.asarray(H0), jnp.float32(alpha),
                       jnp.float32(0.0), sub_iter, False)
    got = fista_sweeps(A, B, jnp.asarray(H0), alpha, 0.0,
                       sub_iter=sub_iter, use_stopping=False,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("r,d,bk", [(3, 20, 1), (8, 129, 2), (25, 300, 4),
                                    (33, 90, 5)])
def test_dict_kernel_fuzz(r, d, bk):
    rng = np.random.default_rng(r + d)
    W = rng.random((d, r)).astype(np.float32)
    H = rng.random((r, 64)).astype(np.float32)
    A = jnp.asarray(H @ H.T)
    B = jnp.asarray(H @ rng.random((64, d)).astype(np.float32))
    want = dict_update_bcd(jnp.asarray(W), A, B)
    got = dict_update_sweep(jnp.asarray(W), A, B, block_rows=bk,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-5)
