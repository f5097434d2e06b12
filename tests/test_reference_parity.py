"""Direct numerical parity against the reference's OWN code.

Imports ``src/onmf.py`` from the read-only reference checkout at test
time (skipped when the checkout isn't mounted) and compares our coder,
dictionary update, and step against the functions the reference actually
executes — the "dictionary/code numerical match on fixed seeds" criterion
from BASELINE.md, established on RNG-free inputs (H0 given) so NumPy and
JAX RNG streams don't have to coincide.
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "src", "onmf.py")),
    reason="reference checkout not mounted")


@pytest.fixture(scope="module")
def ref_onmf():
    sys.path.insert(0, REF)
    try:
        from src import onmf as ref_mod
        yield ref_mod
    finally:
        sys.path.remove(REF)


RNG = np.random.default_rng(42)


def test_coder_matches_reference_function(ref_onmf):
    from onmf_ontf_ndl_tpu.ops.coder import nonneg_code

    W = RNG.random((60, 25))
    X = RNG.random((60, 30))
    H0 = RNG.random((25, 30))
    for alpha, sub_iter, stop in [(0.0, 10, 0.01), (1.0, 10, 0.01),
                                  (2.0, 5, 0.1)]:
        want = ref_onmf.update_code_within_radius(
            X.copy(), W.copy(), H0=H0.copy(), r=None, alpha=alpha,
            sub_iter=sub_iter, stopping_diff=stop)
        got = nonneg_code(jnp.asarray(X), jnp.asarray(W), jnp.asarray(H0),
                          alpha=alpha, sub_iter=sub_iter, stopping_diff=stop,
                          backend="xla")
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-8,
                                   atol=1e-10)


def test_dict_update_matches_reference_method(ref_onmf):
    from onmf_ontf_ndl_tpu.ops.dict_update import dict_update_bcd

    W = RNG.random((40, 25))
    H = RNG.random((25, 50))
    X = W @ H + 0.05 * RNG.random((40, 50))
    A = H @ H.T
    B = H @ X.T
    ref = ref_onmf.Online_NMF(X, n_components=25)
    want = ref.update_dict(W.copy(), A, B)
    got = dict_update_bcd(jnp.asarray(W), jnp.asarray(A), jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-11)


def test_step_matches_reference_step(ref_onmf):
    from onmf_ontf_ndl_tpu.models.state import init_state
    from onmf_ontf_ndl_tpu.models.onmf import onmf_step
    import jax

    d, r, n = 36, 10, 20
    W = RNG.random((d, r))
    X = RNG.random((d, n))
    H0 = RNG.random((r, n))
    A0 = RNG.random((r, r)); A0 = A0 @ A0.T / r
    B0 = RNG.random((r, d))

    # The reference's step draws its own random H0 inside sparse_code; to
    # pin it, monkeypatch np.random.rand for the duration of the call.
    ref = ref_onmf.Online_NMF(X, n_components=r, alpha=0.5, beta=0.8)
    orig_rand = np.random.rand
    np.random.rand = lambda *shape: H0.copy()
    try:
        H_w, aggs_w, W_w = ref.step(X, [A0.copy(), B0.copy()], W.copy(),
                                    np.float64(3.0))
    finally:
        np.random.rand = orig_rand

    st = init_state(jax.random.key(0), d, r, dtype=jnp.float64,
                    W=W, A=A0, B=B0)
    st1, H = onmf_step(st, jnp.asarray(X), t=3.0, H0=jnp.asarray(H0),
                       alpha=0.5, beta=0.8, backend="xla")
    np.testing.assert_allclose(np.asarray(H), H_w, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(st1.A), aggs_w[0], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(st1.B), aggs_w[1], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(st1.W), W_w, rtol=1e-8)


def test_reference_radius_branch_is_aliased_noop(ref_onmf):
    """Documents a reference bug our implementation deliberately fixes:
    in ``update_code_within_radius`` the re-anchor ``H0 = H1``
    (src/onmf.py:263) ALIASES the arrays, so from the second row update
    on, ``np.linalg.norm(H1 - H0, 2)`` is identically zero and the trust
    region never projects again. Our functional implementation re-anchors
    by value, applying the projection per row (PARITY.md deviation #7)."""
    W = RNG.random((24, 6))
    X = RNG.random((24, 8))
    H0 = RNG.random((6, 8))
    from onmf_ontf_ndl_tpu.ops.coder import nonneg_code

    # stopping_diff=-1 forces exactly sub_iter sweeps (the reference's
    # initial dist=1 must stay above the threshold)
    radius = 1e-6
    with_radius = ref_onmf.update_code_within_radius(
        X.copy(), W.copy(), H0=H0.copy(), r=radius, alpha=0.3,
        sub_iter=3, stopping_diff=-1)
    # a WORKING re-anchored trust region can drift at most
    # sweeps * rows * radius from H0; the reference drifts ~0.9 because
    # the aliasing makes every projection after the first a no-op:
    bound = 3 * H0.shape[0] * radius
    moved_ref = np.abs(with_radius - H0).max()
    assert moved_ref > 1000 * bound, moved_ref

    got = nonneg_code(jnp.asarray(X), jnp.asarray(W), jnp.asarray(H0),
                      alpha=0.3, sub_iter=3, stopping_diff=None,
                      radius=radius, backend="xla")
    moved_ours = float(np.abs(np.asarray(got) - H0).max())
    assert moved_ours <= 10 * bound, moved_ours
