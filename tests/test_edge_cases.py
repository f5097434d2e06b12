"""Degenerate-shape edge cases: rank 1, single-sample batches, the
single-node motif (k1=k2=0), and isolated nodes — configurations the
reference's code paths allow implicitly (e.g. its color reconstruction
codes ONE patch at a time, ``image_reconstruction.py:384``)."""

import numpy as np
import jax
import jax.numpy as jnp

from onmf_ontf_ndl_tpu.ops.coder import nonneg_code
from onmf_ontf_ndl_tpu.ops.dict_update import dict_update_bcd

RNG = np.random.default_rng(31)


def test_rank_one_coder_and_dict():
    X = jnp.asarray(RNG.random((12, 8)))
    W = jnp.asarray(RNG.random((12, 1)))
    H = nonneg_code(X, W, key=jax.random.key(0), sub_iter=20,
                    stopping_diff=0.001)
    assert H.shape == (1, 8) and (np.asarray(H) >= 0).all()
    A = H @ H.T
    B = H @ X.T
    W1 = dict_update_bcd(W, A, B)
    assert W1.shape == (12, 1)
    assert float(jnp.linalg.norm(W1[:, 0])) <= 1 + 1e-12


def test_single_sample_batch():
    # the reference recon path codes one patch at a time
    X = jnp.asarray(RNG.random((27, 1)))
    W = jnp.asarray(RNG.random((27, 5)))
    H = nonneg_code(X, W, key=jax.random.key(1), sub_iter=30,
                    stopping_diff=0.01)
    assert H.shape == (5, 1)
    err = float(jnp.linalg.norm(X - W @ H) / jnp.linalg.norm(X))
    assert err < 1.0


def test_single_sample_step():
    from onmf_ontf_ndl_tpu.models.state import init_state
    from onmf_ontf_ndl_tpu.models.onmf import onmf_step

    st = init_state(jax.random.key(0), 9, 3, dtype=jnp.float64)
    st1, H = onmf_step(st, jnp.asarray(RNG.random((9, 1))))
    assert H.shape == (3, 1)
    assert float(st1.t) == 1.0


def test_single_node_motif():
    # k1=k2=0: path_adj is a 1x1 zero matrix; the Glauber move reduces
    # to the MH walk (reference glauber_gen_update :144-153)
    from onmf_ontf_ndl_tpu.apps.network import NetworkReconstructor
    from onmf_ontf_ndl_tpu.data.graphs import graph_from_adjacency
    from onmf_ontf_ndl_tpu.samplers.motif import path_adj

    B = path_adj(0, 0)
    assert B.shape == (1, 1) and B.sum() == 0

    m = 5
    A = np.zeros((m * m, m * m), bool)
    for i in range(m):
        for j in range(m):
            u = i * m + j
            for (di, dj) in [(1, 0), (0, 1)]:
                v = ((i + di) % m) * m + (j + dj) % m
                A[u, v] = A[v, u] = True
    rec = NetworkReconstructor(
        source=graph_from_adjacency(A), n_components=2, MCMC_iterations=3,
        sub_iterations=3, sample_size=20, batch_size=5, k1=0, k2=0,
        dtype=jnp.float64)
    W = rec.train_dict()
    assert W.shape == (1, 2)


def test_isolated_node_graph():
    # a node with no neighbors: tree_sample/rw_update fall back instead
    # of crashing (reference tree_sample fallback :128-131)
    from onmf_ontf_ndl_tpu.data.graphs import graph_from_adjacency
    from onmf_ontf_ndl_tpu.samplers.motif import rw_update, tree_sample

    A = np.zeros((4, 4), bool)
    A[0, 1] = A[1, 0] = True  # node 2, 3 isolated... node 3 isolated
    A[2, 0] = A[0, 2] = True
    g = graph_from_adjacency(A)
    emb = tree_sample(jax.random.key(0), (0, 0), g, jnp.int32(3))
    assert emb.shape == (3,)
    y = rw_update(jax.random.key(1), g, jnp.int32(3))
    assert 0 <= int(y) < 4
