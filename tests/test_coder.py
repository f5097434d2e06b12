"""Golden + property tests for the nonnegative sparse coder."""

import numpy as np
import jax.numpy as jnp
import pytest

from onmf_ontf_ndl_tpu.ops.coder import nonneg_code, nonneg_code_gram
from oracle_np import code_oracle

RNG = np.random.default_rng(0)


def make_problem(d=48, r=25, n=17):
    W = RNG.random((d, r))
    X = RNG.random((d, n))
    H0 = RNG.random((r, n))
    return X, W, H0


@pytest.mark.parametrize("alpha", [0.0, 1.0, 2.0])
@pytest.mark.parametrize("stopping_diff", [None, 0.01, 0.1])
def test_matches_oracle(alpha, stopping_diff):
    X, W, H0 = make_problem()
    want = code_oracle(X, W, H0.copy(), alpha=alpha, sub_iter=10,
                       stopping_diff=stopping_diff)
    got = nonneg_code(jnp.asarray(X), jnp.asarray(W), jnp.asarray(H0),
                      alpha=alpha, sub_iter=10, stopping_diff=stopping_diff)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-12)


def test_matches_oracle_with_radius():
    X, W, H0 = make_problem(d=20, r=8, n=6)
    want = code_oracle(X, W, H0.copy(), alpha=0.5, sub_iter=5,
                       stopping_diff=None, radius=0.3)
    got = nonneg_code(jnp.asarray(X), jnp.asarray(W), jnp.asarray(H0),
                      alpha=0.5, sub_iter=5, stopping_diff=None, radius=0.3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-11)


def test_gram_form_equals_data_form():
    X, W, H0 = make_problem()
    Xj, Wj = jnp.asarray(X), jnp.asarray(W)
    a = nonneg_code(Xj, Wj, jnp.asarray(H0), alpha=1.0, stopping_diff=None)
    # Gram matrices must be computed by the same backend matmuls —
    # last-ulp differences get amplified by the ReLU thresholds.
    b = nonneg_code_gram(Wj.T @ Wj, Wj.T @ Xj,
                         jnp.asarray(H0), alpha=1.0, stopping_diff=None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_nonnegative_and_decreases_objective():
    X, W, H0 = make_problem(d=64, r=16, n=32)
    alpha = 0.5

    def obj(H):
        return 0.5 * np.linalg.norm(X - W @ H) ** 2 + alpha * np.abs(H).sum()

    H = np.asarray(nonneg_code(jnp.asarray(X), jnp.asarray(W),
                               jnp.asarray(H0), alpha=alpha, sub_iter=20,
                               stopping_diff=None))
    assert (H >= 0).all()
    assert obj(H) < obj(np.maximum(H0, 0.0))


def test_random_h0_via_key():
    import jax

    X, W, _ = make_problem()
    H = nonneg_code(jnp.asarray(X), jnp.asarray(W), key=jax.random.key(1),
                    alpha=0.0)
    assert H.shape == (W.shape[1], X.shape[1])
    assert (np.asarray(H) >= 0).all()
