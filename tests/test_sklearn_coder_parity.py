"""Direct parity vs sklearn's SparseCoder(lasso_lars, positive_code=True)
— the coder the reference ONTF actually calls
(``/root/reference/src/ontf.py:79-86``).

SURVEY.md §7 hard-part (b): LARS path solutions and PGD iterates differ
coefficient-wise, so the contract is RECONSTRUCTION-level parity — our
coder must achieve the same objective value ``0.5|x-Wh|^2 + alpha|h|_1``
(and the same reconstruction error) as lasso_lars on the same dictionary,
not the same coefficients. Round 1 established this indirectly through
app-level tests; sklearn is available on this host, so assert it
directly. Skipped when sklearn is missing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sklearn = pytest.importorskip("sklearn")
from sklearn.decomposition import SparseCoder  # noqa: E402

from onmf_ontf_ndl_tpu.ops.coder import nonneg_code  # noqa: E402

RNG = np.random.default_rng(11)


def objective(X, W, H, alpha):
    return (0.5 * np.linalg.norm(X - W @ H) ** 2
            + alpha * np.abs(H).sum())


@pytest.mark.parametrize("alpha", [0.5, 2.0])
def test_objective_parity_with_lasso_lars(alpha):
    d, r, n = 64, 12, 40
    # well-conditioned nonneg dictionary with unit columns, sparse data
    W = np.abs(RNG.standard_normal((d, r)))
    W /= np.linalg.norm(W, axis=0)
    Htrue = np.abs(RNG.standard_normal((r, n))) * (RNG.random((r, n)) < 0.4)
    X = W @ Htrue + 0.01 * RNG.random((d, n))

    # sklearn convention: dictionary rows are atoms, samples are rows.
    # transform_alpha is the L1 weight of the unscaled objective
    # 0.5|x - Wh|^2 + alpha|h|_1 (sklearn divides by n_features
    # internally and multiplies back for Lars).
    coder = SparseCoder(dictionary=W.T, transform_algorithm="lasso_lars",
                        transform_alpha=alpha, positive_code=True)
    H_lars = coder.transform(X.T).T

    H_ours = np.asarray(nonneg_code(
        jnp.asarray(X), jnp.asarray(W), key=jax.random.key(0), alpha=alpha, sub_iter=200,
        stopping_diff=1e-7, backend="xla"))

    obj_lars = objective(X, W, H_lars, alpha)
    obj_ours = objective(X, W, H_ours, alpha)
    # same convex objective, two solvers: converged values must agree
    assert obj_ours <= obj_lars * 1.01, (obj_ours, obj_lars)

    rec_lars = np.linalg.norm(X - W @ H_lars) / np.linalg.norm(X)
    rec_ours = np.linalg.norm(X - W @ H_ours) / np.linalg.norm(X)
    assert abs(rec_ours - rec_lars) < 0.02, (rec_ours, rec_lars)


def test_alpha_zero_matches_nonneg_least_squares():
    d, r, n = 32, 8, 16
    W = np.abs(RNG.standard_normal((d, r)))
    W /= np.linalg.norm(W, axis=0)
    X = W @ np.abs(RNG.standard_normal((r, n)))
    H_ours = np.asarray(nonneg_code(
        jnp.asarray(X), jnp.asarray(W), key=jax.random.key(0), alpha=0.0, sub_iter=500,
        stopping_diff=1e-9, backend="xla"))
    # an exact nonnegative solution exists; the coder's diminishing
    # 1/sqrt(i+10) step (the reference's schedule) converges sublinearly,
    # so near-exact rather than exact fit is the correct expectation
    assert np.linalg.norm(X - W @ H_ours) / np.linalg.norm(X) < 1e-2
