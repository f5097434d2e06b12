"""End-to-end Ising trajectory-learning parity vs the reference (small).

Reduced-config regression guard for
``benchmarks/reference_parity_ising.py`` (full record in
``benchmarks/results.json``). Criterion: held-out patch reconstruction
error of the two learned dictionaries, coded by the reference's own
coder, within 10%. Skipped when the reference checkout isn't mounted.
"""

import os
import sys

import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "ising_simulator.py")),
    reason="reference checkout not mounted")


def test_ising_dictionary_quality_matches_reference():
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    try:
        import reference_parity_ising as rp
    finally:
        sys.path.remove(os.path.join(REPO, "benchmarks"))

    old = (rp.N, rp.ROUNDS, rp.NUM_PATCHES, rp.BURN_SWEEPS, rp.INNER)
    rp.N, rp.ROUNDS, rp.NUM_PATCHES, rp.BURN_SWEEPS, rp.INNER = \
        40, 6, 150, 15, 12
    try:
        lattice = rp.make_lattice()
        _, W_ref = rp.run_reference(lattice)
        _, W_ours = rp.run_ours(lattice)
        rec_ref = rp.heldout_recon_err(lattice, W_ref)
        rec_ours = rp.heldout_recon_err(lattice, W_ours)
    finally:
        rp.N, rp.ROUNDS, rp.NUM_PATCHES, rp.BURN_SWEEPS, rp.INNER = old

    assert abs(rec_ours - rec_ref) / rec_ref < 0.10, (rec_ref, rec_ours)
