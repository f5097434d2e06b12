"""Host-side image ingest. Images are read once on the host and live on
device thereafter.

Matches the reference ingest semantics
(``/root/reference/image_reconstruction.py:73-92``): PIL open, RGB or L
conversion, /255 normalization; ``.npy`` "matrix" inputs are +-1 spin
fields mapped to [0, 1] via (x+1)/2; local-mean downscaling with
zero-padded edge blocks (skimage ``downscale_local_mean`` semantics,
used at ``/root/reference/image_reconstruction.py:157``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["load_image", "downscale_local_mean"]


def load_image(path: str, *, is_matrix: bool = False, is_color: bool = True,
               dtype=jnp.float32):
    """Read an image (or a saved +-1 matrix) as a [0, 1] device array."""
    if is_matrix:
        arr = np.load(path)
        data = (arr + 1.0) / 2.0
    else:
        from PIL import Image

        with Image.open(path) as img:
            data = np.asarray(
                img.convert("RGB" if is_color else "L")) / 255.0
    return jnp.asarray(data, dtype)


def downscale_local_mean(img, factor: int):
    """Block-mean downscale by ``factor`` along the two leading axes.

    Edge blocks that extend past the image are zero-padded before
    averaging (diluting them), matching skimage's behavior that the
    reference relies on.
    """
    if factor <= 1:
        return img
    h, w = img.shape[0], img.shape[1]
    ph = (-h) % factor
    pw = (-w) % factor
    pad = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
    x = jnp.pad(img, pad)
    nh, nw = (h + ph) // factor, (w + pw) // factor
    x = x.reshape((nh, factor, nw, factor) + img.shape[2:])
    return x.mean(axis=(1, 3))
