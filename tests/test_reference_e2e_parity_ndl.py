"""End-to-end NDL accuracy parity vs the reference (small config).

Reduced-config regression guard for ``benchmarks/reference_parity_ndl.py``
(full-config record in ``benchmarks/results.json``). Statistical
comparison at the accuracy level (independent MCMC chains on each side).
Skipped when the reference checkout isn't mounted.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "network_reconstruction_nx.py")),
    reason="reference checkout not mounted")


def _torus(m=8):
    n = m * m
    A = np.zeros((n, n))
    for i in range(m):
        for j in range(m):
            u = i * m + j
            for (di, dj) in [(1, 0), (0, 1)]:
                v = ((i + di) % m) * m + (j + dj) % m
                A[u, v] = A[v, u] = 1.0
    return A


def test_ndl_accuracy_close_to_reference():
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    try:
        import reference_parity_ndl as rp
    finally:
        sys.path.remove(os.path.join(REPO, "benchmarks"))

    A = _torus(8)
    old = (rp.MCMC_ITER, rp.SAMPLE_SIZE, rp.RECONS_ITER, rp.INNER)
    rp.MCMC_ITER, rp.SAMPLE_SIZE, rp.RECONS_ITER, rp.INNER = 12, 120, 2400, 20
    try:
        acc_ref = rp.run_reference(A)
        acc_ours = rp.run_ours(A)
    finally:
        rp.MCMC_ITER, rp.SAMPLE_SIZE, rp.RECONS_ITER, rp.INNER = old

    # both pipelines must reconstruct the torus nearly perfectly
    assert acc_ref > 0.85, acc_ref
    assert acc_ours > 0.85, acc_ours
    assert abs(acc_ours - acc_ref) <= 0.12, (acc_ref, acc_ours)
