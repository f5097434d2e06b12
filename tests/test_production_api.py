"""Production-surface tests: sklearn-style shims and periodic
checkpointing (chunked training must equal the uninterrupted run)."""

import numpy as np
import jax
import jax.numpy as jnp

RNG = np.random.default_rng(21)


def test_sklearn_style_fit_transform():
    from onmf_ontf_ndl_tpu.models.onmf import OnlineNMF

    Xrows = RNG.random((60, 30))  # samples x features
    nmf = OnlineNMF(np.zeros((30, 1)), n_components=5, iterations=20,
                    batch_size=20, dtype=jnp.float64)
    H = nmf.fit_transform(Xrows)
    assert H.shape == (60, 5)
    assert (np.asarray(H) >= 0).all()
    assert nmf.components_.shape == (5, 30)
    rec = nmf.inverse_transform(H)
    assert rec.shape == Xrows.shape
    # transform is deterministic given the fitted state
    np.testing.assert_array_equal(np.asarray(nmf.transform(Xrows)),
                                  np.asarray(H))
    # fitting reduces reconstruction error vs a random dictionary
    err = np.linalg.norm(np.asarray(rec) - Xrows) / np.linalg.norm(Xrows)
    assert err < 0.6


def test_image_checkpoint_chunking_exact(tmp_path):
    from onmf_ontf_ndl_tpu.apps.image import ImageReconstructor
    from onmf_ontf_ndl_tpu.utils.checkpoint import load_state

    y, x = np.mgrid[0:32, 0:40]
    img = 0.5 + 0.3 * np.sin(x / 5.0) * np.cos(y / 4.0)

    kw = dict(data=img, n_components=4, iterations=6, sub_iterations=3,
              num_patches=12, batch_size=6, patch_size=4, is_color=False,
              dtype=jnp.float64, seed=3)
    a = ImageReconstructor(**kw)
    Wa = a.train_dict()

    b = ImageReconstructor(**kw)
    ckpt = str(tmp_path / "img.npz")
    Wb = b.train_dict(checkpoint_path=ckpt, checkpoint_every=2)
    np.testing.assert_array_equal(np.asarray(Wa), np.asarray(Wb))
    # the checkpoint on disk is the final state
    st = load_state(ckpt)
    np.testing.assert_array_equal(np.asarray(st.W), np.asarray(Wb))
    assert float(st.t) == float(a.state.t)


def test_network_checkpoint_chunking_exact(tmp_path):
    from onmf_ontf_ndl_tpu.apps.network import NetworkReconstructor
    from onmf_ontf_ndl_tpu.data.graphs import graph_from_adjacency

    m = 6
    A = np.zeros((m * m, m * m), bool)
    for i in range(m):
        for j in range(m):
            u = i * m + j
            for (di, dj) in [(1, 0), (0, 1)]:
                v = ((i + di) % m) * m + (j + dj) % m
                A[u, v] = A[v, u] = True

    kw = dict(source=graph_from_adjacency(A), n_components=6,
              MCMC_iterations=4, sub_iterations=3, sample_size=30,
              batch_size=10, k1=0, k2=1, dtype=jnp.float64, seed=7)
    a = NetworkReconstructor(**kw)
    Wa = a.train_dict()

    b = NetworkReconstructor(**kw)
    Wb = b.train_dict(checkpoint_path=str(tmp_path / "ndl.npz"),
                      checkpoint_every=2)
    np.testing.assert_array_equal(np.asarray(Wa), np.asarray(Wb))
    # code accumulation matches (the shell passes discard_first only to
    # the first chunk, so the reference's first-iteration discard happens
    # exactly once per logical run)
    np.testing.assert_allclose(np.asarray(a.code), np.asarray(b.code),
                               rtol=1e-12)


def test_fit_resets_state():
    # sklearn contract: a second fit() refits from the configured initial
    # state instead of continuing with stale aggregates
    from onmf_ontf_ndl_tpu.models.onmf import OnlineNMF

    X1 = RNG.random((40, 20))
    X2 = RNG.random((40, 20))
    nmf = OnlineNMF(np.zeros((20, 1)), n_components=4, iterations=15,
                    batch_size=15, dtype=jnp.float64)
    nmf.fit(X1)
    t_after_first = float(nmf.state.t)
    nmf.fit(X2)
    W_refit = np.asarray(nmf.state.W)
    assert float(nmf.state.t) == t_after_first  # schedule restarted

    fresh = OnlineNMF(np.zeros((20, 1)), n_components=4, iterations=15,
                      batch_size=15, dtype=jnp.float64).fit(X2)
    np.testing.assert_array_equal(W_refit, np.asarray(fresh.state.W))


def test_image_checkpoint_resume_after_interrupt(tmp_path):
    from onmf_ontf_ndl_tpu.apps.image import ImageReconstructor

    y, x = np.mgrid[0:32, 0:40]
    img = 0.5 + 0.3 * np.sin(x / 5.0) * np.cos(y / 4.0)
    kw = dict(data=img, n_components=4, iterations=6, sub_iterations=3,
              num_patches=12, batch_size=6, patch_size=4, is_color=False,
              dtype=jnp.float64, seed=3)
    a = ImageReconstructor(**kw)
    Wa = a.train_dict()

    # simulate a crash: run only 4 of 6 iterations, then a FRESH process
    # resumes from the checkpoint and must complete only the remainder
    ckpt = str(tmp_path / "img.npz")
    b = ImageReconstructor(**kw)
    b.iterations = 4
    b.train_dict(checkpoint_path=ckpt, checkpoint_every=2)
    c = ImageReconstructor(**kw)  # fresh instance, full iteration count
    Wc = c.train_dict(checkpoint_path=ckpt, checkpoint_every=2, resume=True)
    np.testing.assert_array_equal(np.asarray(Wa), np.asarray(Wc))
    assert float(c.state.t) == float(a.state.t)


def test_stack_checkpoint_chunking_exact(tmp_path):
    from onmf_ontf_ndl_tpu.apps.image import ImageReconstructor

    stack = np.sign(RNG.standard_normal((4, 24, 24))) * 1.0
    p = str(tmp_path / "stack.npy")
    np.save(p, stack)
    kw = dict(path=p, is_stack=True, n_components=4, iterations=12,
              sub_iterations=3, num_patches=10, batch_size=5, patch_size=4,
              dtype=jnp.float64, seed=2)
    a = ImageReconstructor(**kw)
    Wa = a.train_dict()
    b = ImageReconstructor(**kw)
    Wb = b.train_dict(checkpoint_path=str(tmp_path / "s.npz"),
                      checkpoint_every=1)
    np.testing.assert_array_equal(np.asarray(Wa), np.asarray(Wb))


def test_network_checkpoint_resume_after_interrupt(tmp_path):
    from onmf_ontf_ndl_tpu.apps.network import NetworkReconstructor
    from onmf_ontf_ndl_tpu.data.graphs import graph_from_adjacency

    m = 6
    A = np.zeros((m * m, m * m), bool)
    for i in range(m):
        for j in range(m):
            u = i * m + j
            for (di, dj) in [(1, 0), (0, 1)]:
                v = ((i + di) % m) * m + (j + dj) % m
                A[u, v] = A[v, u] = True
    kw = dict(source=graph_from_adjacency(A), n_components=6,
              MCMC_iterations=4, sub_iterations=3, sample_size=30,
              batch_size=10, k1=0, k2=1, dtype=jnp.float64, seed=7)
    a = NetworkReconstructor(**kw)
    Wa = a.train_dict()

    ckpt = str(tmp_path / "ndl.npz")
    b = NetworkReconstructor(**kw)
    b.MCMC_iterations = 2           # "crash" after half the run
    b.train_dict(checkpoint_path=ckpt, checkpoint_every=1)
    c = NetworkReconstructor(**kw)  # fresh instance resumes the rest
    Wc = c.train_dict(checkpoint_path=ckpt, checkpoint_every=1, resume=True)
    np.testing.assert_array_equal(np.asarray(Wa), np.asarray(Wc))
    # the code matrix (incl. chain embedding continuity and the
    # once-per-run first-iteration discard) matches the uninterrupted run
    np.testing.assert_allclose(np.asarray(a.code), np.asarray(c.code),
                               rtol=1e-12)


def test_network_execution_chunking_no_path_exact():
    # checkpoint_every WITHOUT a path = pure execution chunking (bounds
    # the single-device-program runtime at scale); must equal the fused
    # run exactly, with no file I/O
    from onmf_ontf_ndl_tpu.apps.network import NetworkReconstructor
    from onmf_ontf_ndl_tpu.data.graphs import graph_from_adjacency

    m = 6
    A = np.zeros((m * m, m * m), bool)
    for i in range(m):
        for j in range(m):
            u = i * m + j
            for (di, dj) in [(1, 0), (0, 1)]:
                v = ((i + di) % m) * m + (j + dj) % m
                A[u, v] = A[v, u] = True
    kw = dict(source=graph_from_adjacency(A), n_components=6,
              MCMC_iterations=5, sub_iterations=3, sample_size=30,
              batch_size=10, k1=0, k2=1, dtype=jnp.float64, seed=7)
    a = NetworkReconstructor(**kw)
    Wa = a.train_dict()

    b = NetworkReconstructor(**kw)
    Wb = b.train_dict(checkpoint_every=2)   # 2 + 2 + 1 iterations
    np.testing.assert_array_equal(np.asarray(Wa), np.asarray(Wb))
    np.testing.assert_allclose(np.asarray(a.code), np.asarray(b.code),
                               rtol=1e-12)
    # second call accumulates code like the fused branch does
    a.train_dict()
    b.train_dict(checkpoint_every=2)
    np.testing.assert_allclose(np.asarray(a.code), np.asarray(b.code),
                               rtol=1e-12)
