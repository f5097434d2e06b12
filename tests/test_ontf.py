"""ONTF consistency: the tensor path equals ONMF on the unfolded matrix."""

import numpy as np
import jax
import jax.numpy as jnp

from onmf_ontf_ndl_tpu.models.ontf import OnlineNTF
from onmf_ontf_ndl_tpu.models.state import init_state
from onmf_ontf_ndl_tpu.models.onmf import train_dict
from onmf_ontf_ndl_tpu.ops.unfold import unfold

RNG = np.random.default_rng(13)


def test_ontf_equals_onmf_on_unfolded():
    X = RNG.random((16, 3, 30))
    for mode, joint in [(2, True), (0, False), (1, False)]:
        # coder/coder_sub_iter pinned to match the ONMF side (the ONTF
        # default is the converged "exact" coder with a 100-sweep floor,
        # matching the reference's exact sklearn solve)
        ntf = OnlineNTF(X, n_components=5, iterations=6, batch_size=8,
                        mode=mode, learn_joint_dict=joint, alpha=0.7,
                        coder="bcd", coder_sub_iter=10, seed=4,
                        dtype=jnp.float64)
        W, A, B, _ = ntf.train_dict_single()

        Xu = unfold(jnp.asarray(X, jnp.float64), mode)
        if joint:
            Xu = Xu.T
        # same seed => identical initial state; the ONTF path must then be
        # exactly ONMF training on the unfolded matrix
        st = init_state(jax.random.key(4), Xu.shape[0], 5, dtype=jnp.float64)
        st1, _ = train_dict(st, Xu, iterations=6, batch_size=8, alpha=0.7,
                            beta=1.0, sub_iter=10, stopping_diff=0.01)
        np.testing.assert_allclose(np.asarray(W), np.asarray(st1.W),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(A), np.asarray(st1.A),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(B), np.asarray(st1.B),
                                   rtol=1e-10)


def test_ontf_transposed_code_convention():
    # joint_sparse_code_tensor returns samples x topics (the reference's
    # transposed convention, src/ontf.py:59-89)
    X = RNG.random((12, 20))
    ntf = OnlineNTF(RNG.random((4, 3, 7)), n_components=6, dtype=jnp.float64)
    W = RNG.random((12, 6))
    H = ntf.joint_sparse_code_tensor(X, W)
    assert H.shape == (20, 6)
    assert (np.asarray(H) >= 0).all()
