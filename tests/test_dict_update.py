"""Golden + invariant tests for the column-BCD dictionary update."""

import numpy as np
import jax.numpy as jnp

from onmf_ontf_ndl_tpu.ops.dict_update import dict_update_bcd
from oracle_np import dict_oracle

RNG = np.random.default_rng(1)


def test_matches_oracle():
    d, r = 75, 25
    W = RNG.random((d, r))
    H = RNG.random((r, 40))
    X = W @ H + 0.01 * RNG.random((d, 40))
    A = H @ H.T
    B = H @ X.T
    want = dict_oracle(W, A, B)
    got = dict_update_bcd(jnp.asarray(W), jnp.asarray(A), jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-12)


def test_invariants():
    d, r = 30, 9
    W = RNG.random((d, r))
    A = RNG.random((r, r))
    A = A @ A.T
    B = RNG.random((r, d))
    W1 = np.asarray(dict_update_bcd(jnp.asarray(W), jnp.asarray(A), jnp.asarray(B)))
    assert (W1 >= 0).all()
    assert (np.linalg.norm(W1, axis=0) <= 1.0 + 1e-12).all()


def test_zero_aggregates_only_normalize():
    # With A=B=0 the update reduces to projecting columns onto the unit
    # ball (the reference's first-step behavior).
    d, r = 12, 4
    W = 3.0 * RNG.random((d, r))
    W1 = np.asarray(dict_update_bcd(jnp.asarray(W), jnp.zeros((r, r)), jnp.zeros((r, d))))
    want = W / np.maximum(1.0, np.linalg.norm(W, axis=0, keepdims=True))
    np.testing.assert_allclose(W1, want, rtol=1e-12)
