"""End-to-end ONTF recon-error parity vs the reference (small config).

Reduced-config regression guard for ``benchmarks/reference_parity_ontf.py``
(full-config record in ``benchmarks/results.json``). The reference codes
with sklearn's exact LARS solver; ours with the DEFAULT tensor-app coder
("exact": converged accelerated PGD on the same objective) — the
criterion is reconstruction-level (both at the model-class floor), not
coefficient-level. Skipped when the reference checkout isn't mounted.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "src", "ontf.py")),
    reason="reference checkout not mounted")


def test_ontf_recon_error_close_to_reference():
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    try:
        import reference_parity_ontf as rp
    finally:
        sys.path.remove(os.path.join(REPO, "benchmarks"))

    rng = np.random.default_rng(1)
    y, x = np.mgrid[0:72, 0:96]
    base = 0.5 + 0.25 * np.sin(x / 8.0) * np.cos(y / 6.0)
    data = np.stack([base,
                     0.5 + 0.25 * np.cos(x / 7.0) * np.sin(y / 9.0),
                     0.4 + 0.3 * np.sin((x + y) / 10.0)], axis=-1)
    data = np.clip(data + 0.03 * rng.random(data.shape), 0, 1)

    old = (rp.OUTER, rp.NUM_PATCHES, rp.STRIDE)
    rp.OUTER, rp.NUM_PATCHES, rp.STRIDE = 8, 60, 4
    try:
        err_ref, _ = rp.run_reference(data)
        err_ours, _ = rp.run_ours(data)      # the app default ("exact")
    finally:
        rp.OUTER, rp.NUM_PATCHES, rp.STRIDE = old

    assert err_ref < 0.25 and err_ours < 0.25  # both at the floor
    rel = abs(err_ours - err_ref) / err_ref
    assert rel < 0.15, (err_ref, err_ours)
