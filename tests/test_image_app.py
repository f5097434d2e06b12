"""End-to-end image pipeline test on a tiny synthetic image."""

import numpy as np
import jax
import jax.numpy as jnp

from onmf_ontf_ndl_tpu.apps.image import ImageReconstructor, reconstruct


def make_image(h=48, w=48, color=True, seed=4):
    """Piecewise-structured synthetic image with repeating texture."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 0.5 + 0.4 * np.sin(xx / 3.0) * np.cos(yy / 4.0)
    if color:
        img = np.stack([base, base**2, 1 - base], axis=-1)
    else:
        img = base
    img += 0.02 * rng.random(img.shape)
    return np.clip(img, 0, 1)


def test_color_pipeline_learns_and_reconstructs():
    img = make_image(color=True)
    rec = ImageReconstructor(
        data=img, n_components=16, iterations=20, sub_iterations=5,
        num_patches=50, batch_size=16, patch_size=6, is_color=True,
        dtype=jnp.float64,
    )
    W0 = np.asarray(rec.state.W)
    rec.train_dict()
    W = np.asarray(rec.state.W)
    assert (W >= 0).all()
    assert float(rec.state.t) == 20 * 5  # outer * inner history advance

    out0 = np.asarray(reconstruct(
        jnp.asarray(img), jnp.asarray(W0 / np.maximum(1, np.linalg.norm(W0, axis=0))),
        jax.random.key(1), patch_size=6, stride=2))
    out = np.asarray(rec.reconstruct_image_color(data=img, recons_resolution=2))
    assert out.shape == img.shape

    def err(o):
        mask = o.sum(axis=-1) > 0
        return np.linalg.norm((o - img)[mask]) / np.linalg.norm(img[mask])

    assert err(out) < err(out0)
    # alpha=1 L1 shrinkage (the reference's hardcoded recon setting) caps
    # achievable fidelity; the comparative assertion above is the signal.
    assert err(out) < 0.3


def test_gray_pipeline_full_grid():
    img = make_image(color=False)
    rec = ImageReconstructor(
        data=img, n_components=9, iterations=10, sub_iterations=5,
        num_patches=40, batch_size=10, patch_size=5, is_color=False,
        downscale_factor=1, dtype=jnp.float64,
    )
    rec.train_dict()
    out = np.asarray(rec.reconstruct_image(data=img))
    assert out.shape == img.shape
    # full grid paints every pixel
    assert (out > 0).all()
    assert np.linalg.norm(out - img) / np.linalg.norm(img) < 0.25


def test_stack_of_matrices_pipeline():
    import jax.numpy as jnp

    rng = np.random.default_rng(12)
    stack = np.sign(rng.standard_normal((4, 24, 24)))  # +-1 matrices
    rec = ImageReconstructor(
        data=(stack + 1) / 2, is_stack=True, is_color=False,
        n_components=6, iterations=8, sub_iterations=4, num_patches=20,
        batch_size=8, patch_size=4, dtype=jnp.float64,
    )
    W = rec.train_dict()
    assert W.shape == (16, 6)
    assert (np.asarray(W) >= 0).all()
