"""Tests for patch extraction / overlap-average reconstruction ops."""

import numpy as np
import jax
import jax.numpy as jnp

from onmf_ontf_ndl_tpu.ops.patches import (
    all_patch_corners,
    extract_patches,
    grid_patch_corners,
    overlap_average,
    random_patch_corners,
)
from onmf_ontf_ndl_tpu.data.images import downscale_local_mean

RNG = np.random.default_rng(3)


def test_extract_matches_numpy_slicing_color():
    img = RNG.random((20, 24, 3))
    a = np.array([0, 5, 13, 2])
    b = np.array([7, 0, 11, 14])
    k = 6
    X = np.asarray(extract_patches(jnp.asarray(img), (jnp.asarray(a), jnp.asarray(b)), k))
    for i in range(len(a)):
        want = img[a[i]:a[i]+k, b[i]:b[i]+k, :].reshape(-1)
        np.testing.assert_allclose(X[:, i], want)


def test_extract_matches_numpy_slicing_gray():
    img = RNG.random((15, 17))
    a, b = np.array([1, 9]), np.array([3, 8])
    k = 5
    X = np.asarray(extract_patches(jnp.asarray(img), (jnp.asarray(a), jnp.asarray(b)), k))
    for i in range(2):
        np.testing.assert_allclose(X[:, i], img[a[i]:a[i]+k, b[i]:b[i]+k].reshape(-1))


def test_random_corners_in_range():
    a, b = random_patch_corners(jax.random.key(0), (30, 40), 7, 500)
    a, b = np.asarray(a), np.asarray(b)
    assert a.min() >= 0 and a.max() <= 30 - 7 - 1
    assert b.min() >= 0 and b.max() <= 40 - 7 - 1


def test_grid_corners_exclusive():
    # np.arange(0, H-k, stride) semantics: last start strictly < H-k
    a, b = grid_patch_corners((25, 25), 10, 5)
    a, b = np.asarray(a), np.asarray(b)
    want = [i for i in range(0, 15, 5)]
    assert sorted(set(a)) == want and sorted(set(b)) == want


def test_all_corners_inclusive_row_major():
    a, b = all_patch_corners((5, 4), 3)
    assert np.asarray(a).tolist() == [0, 0, 1, 1, 2, 2]
    assert np.asarray(b).tolist() == [0, 1, 0, 1, 0, 1]


def test_overlap_average_equals_running_average_oracle():
    img_shape = (12, 14, 3)
    k = 4
    n = 9
    a = RNG.integers(0, img_shape[0] - k, n)
    b = RNG.integers(0, img_shape[1] - k, n)
    vals = RNG.random((k * k * 3, n))

    # sequential running-average oracle (the reference's paint loop,
    # image_reconstruction.py:389-392)
    acc = np.zeros(img_shape)
    cnt = np.zeros(img_shape[:2])
    for p in range(n):
        patch = vals[:, p].reshape(k, k, 3)
        for x in range(k):
            for y in range(k):
                c = cnt[a[p]+x, b[p]+y]
                acc[a[p]+x, b[p]+y] = (c * acc[a[p]+x, b[p]+y] + patch[x, y]) / (c + 1)
                cnt[a[p]+x, b[p]+y] += 1

    got = np.asarray(overlap_average(
        jnp.asarray(vals), (jnp.asarray(a), jnp.asarray(b)), k, img_shape))
    np.testing.assert_allclose(got, acc, rtol=1e-10, atol=1e-12)


def test_downscale_local_mean_matches_blockmean_with_zero_pad():
    img = RNG.random((7, 9))
    got = np.asarray(downscale_local_mean(jnp.asarray(img), 3))
    padded = np.zeros((9, 9))
    padded[:7, :9] = img
    want = padded.reshape(3, 3, 3, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(got, want, rtol=1e-12)
    try:
        from skimage.transform import downscale_local_mean as sk_down
        np.testing.assert_allclose(got, sk_down(img, (3, 3)), rtol=1e-10)
    except ImportError:
        pass


def test_extract_patches_grid_matches_corner_form():
    from onmf_ontf_ndl_tpu.ops.patches import extract_patches_grid

    for color in (True, False):
        img = RNG.random((19, 23, 3) if color else (19, 23))
        for stride, inclusive in [(1, True), (3, False), (5, False)]:
            if inclusive:
                corners = all_patch_corners(img.shape[:2], 4)
            else:
                corners = grid_patch_corners(img.shape[:2], 4, stride)
            want = np.asarray(extract_patches(jnp.asarray(img), corners, 4))
            got = np.asarray(extract_patches_grid(jnp.asarray(img), 4,
                                                  stride, inclusive=inclusive))
            np.testing.assert_allclose(got, want, rtol=1e-12)


def test_overlap_average_grid_matches_corner_form():
    from onmf_ontf_ndl_tpu.ops.patches import overlap_average_grid

    # shapes kept small: the corner-based oracle is a general scatter
    # whose XLA compile time scales with the patch count (docs/DESIGN.md
    # section 5) — each (shape, stride) combo is a fresh compile
    for shape in [(14, 17, 3), (14, 17)]:
        k = 5
        # keep one even stride: its k=5 remainder pattern differs from
        # the odd-stride tilings
        for stride, inclusive in [(1, True), (2, False), (3, False)]:
            if inclusive:
                corners = all_patch_corners(shape[:2], k)
            else:
                corners = grid_patch_corners(shape[:2], k, stride)
            n = int(np.asarray(corners[0]).shape[0])
            d = k * k * (shape[2] if len(shape) == 3 else 1)
            vals = jnp.asarray(RNG.random((d, n)))
            want = np.asarray(overlap_average(vals, corners, k, shape))
            got = np.asarray(overlap_average_grid(vals, k, stride, shape,
                                                  inclusive=inclusive))
            np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_overlap_average_grid_empty_exclusive_grid():
    """Image dim == k with stride > 1: the exclusive grid is empty along
    that axis; the fold must return a zero canvas (reference's empty
    loop), not crash."""
    from onmf_ontf_ndl_tpu.ops.patches import (extract_patches_grid,
                                               overlap_average_grid)

    img = jnp.ones((4, 9))
    vals = extract_patches_grid(img, 4, 2)
    out = overlap_average_grid(vals, 4, 2, img.shape)
    assert out.shape == (4, 9)
    assert float(jnp.abs(out).sum()) == 0.0
