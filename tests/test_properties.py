"""Property / fuzz tests across random shapes and inputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onmf_ontf_ndl_tpu.ops.coder import nonneg_code_gram
from onmf_ontf_ndl_tpu.ops.dict_update import dict_update_bcd
from onmf_ontf_ndl_tpu.ops.patches import (
    all_patch_corners, extract_patches, extract_patches_grid,
    grid_patch_corners, overlap_average, overlap_average_grid)
from onmf_ontf_ndl_tpu.ops.unfold import fold, unfold

RNG = np.random.default_rng(23)


@pytest.mark.parametrize("seed", range(5))
def test_coder_monotone_objective_per_sweep(seed):
    # each additional Gauss-Seidel sweep must not increase the objective
    # (the reference's i+10 step damping exists exactly for this)
    rng = np.random.default_rng(seed)
    d, r, n = 30, 8, 12
    W = rng.random((d, r))
    X = rng.random((d, n))
    H0 = rng.random((r, n))
    alpha = rng.random() * 2
    A = jnp.asarray(W.T @ W)
    B = jnp.asarray(W.T @ X)

    def obj(H):
        H = np.asarray(H)
        return 0.5 * np.linalg.norm(X - W @ H) ** 2 + alpha * np.abs(H).sum()

    prev = obj(np.maximum(H0, 0))
    for sweeps in range(1, 8):
        cur = obj(nonneg_code_gram(A, B, jnp.asarray(H0), alpha=alpha,
                                   sub_iter=sweeps, stopping_diff=None))
        assert cur <= prev + 1e-9, (sweeps, cur, prev)
        prev = cur


@pytest.mark.parametrize("seed", range(3))
def test_dict_update_reduces_surrogate(seed):
    # one BCD pass must not increase the surrogate
    # f(W) = 0.5 tr(W A W^T) - tr(W B) for PSD A (minimized by the update)
    rng = np.random.default_rng(100 + seed)
    d, r = 25, 7
    W = rng.random((d, r))
    H = rng.random((r, 40))
    X = rng.random((d, 40))
    A = H @ H.T
    B = H @ X.T

    def f(Wm):
        Wm = np.asarray(Wm)
        return 0.5 * np.trace(Wm @ A @ Wm.T) - np.trace(Wm @ B)

    # projected coordinate descent with step 1/(A_jj+1) < 1/L_jj descends
    # when started from a FEASIBLE point (nonneg, unit-ball columns)
    W = W / np.maximum(1, np.linalg.norm(W, axis=0))
    W1 = dict_update_bcd(jnp.asarray(W), jnp.asarray(A), jnp.asarray(B))
    assert f(W1) <= f(W) + 1e-9


@pytest.mark.parametrize("shape,k,stride", [
    ((17, 19), 3, 2), ((32, 16, 3), 5, 3), ((9, 9), 4, 1), ((21, 40, 3), 7, 5),
])
def test_patch_roundtrip_identity(shape, k, stride):
    # extracting all grid patches and overlap-averaging them back must
    # reproduce the covered pixels exactly
    img = jnp.asarray(RNG.random(shape))
    X = extract_patches_grid(img, k, stride)
    out = np.asarray(overlap_average_grid(X, k, stride, shape))
    a, b = grid_patch_corners(shape[:2], k, stride)
    covered = np.zeros(shape[:2], bool)
    for i, j in zip(np.asarray(a), np.asarray(b)):
        covered[i:i+k, j:j+k] = True
    want = np.asarray(img)
    got = out
    np.testing.assert_allclose(got[covered], want[covered], rtol=1e-6)
    assert (got[~covered] == 0).all()


@pytest.mark.parametrize("shape,mode", [
    ((4, 5, 6), 0), ((4, 5, 6), 1), ((4, 5, 6), 2), ((3, 7, 2, 4), 2),
])
def test_unfold_fold_roundtrip(shape, mode):
    X = jnp.asarray(RNG.random(shape))
    np.testing.assert_array_equal(
        np.asarray(fold(unfold(X, mode), mode, shape)), np.asarray(X))


def test_corner_and_grid_extract_agree_fuzz():
    for _ in range(4):
        h = int(RNG.integers(10, 30))
        w = int(RNG.integers(10, 30))
        k = int(RNG.integers(2, 6))
        stride = int(RNG.integers(1, 5))
        img = jnp.asarray(RNG.random((h, w)))
        want = extract_patches(img, grid_patch_corners((h, w), k, stride), k)
        got = extract_patches_grid(img, k, stride)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12)
