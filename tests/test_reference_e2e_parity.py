"""End-to-end recon-error parity vs the reference pipeline (small config).

The measured BASELINE.md criterion ("recon error within 1% of
reference") at full config lives in ``benchmarks/reference_parity.py``
(recorded in ``benchmarks/results.json``); this test runs the same
harness at a reduced config as a regression guard. Skipped when the
reference checkout isn't mounted.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "src", "onmf.py")),
    reason="reference checkout not mounted")


def test_recon_error_within_tolerance_of_reference():
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    try:
        import reference_parity as rp
    finally:
        sys.path.remove(os.path.join(REPO, "benchmarks"))

    # reduced config: enough training that both sides converge to the
    # model-class floor, small enough to stay in the test-time budget
    rng = np.random.default_rng(0)
    # synthetic smooth image so the test has no data dependency
    y, x = np.mgrid[0:96, 0:128]
    data = 0.5 + 0.25 * np.sin(x / 9.0) * np.cos(y / 7.0) \
        + 0.05 * rng.random((96, 128))

    old = (rp.OUTER, rp.NUM_PATCHES)
    rp.OUTER, rp.NUM_PATCHES = 20, 80
    try:
        err_ref = rp.run_reference(data)
        err_ours = rp.run_ours(data)
    finally:
        rp.OUTER, rp.NUM_PATCHES = old

    # at the reduced config allow 3% (the recorded full-config gap is
    # 0.56%, within the 1% criterion — benchmarks/results.json)
    assert abs(err_ours - err_ref) / err_ref < 0.03, (err_ours, err_ref)
