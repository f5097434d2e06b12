"""Video / GIF frame ingest for streaming dictionary learning.

The reference's ``online_learning_video.ipynb`` (stripped from the repo;
``/root/reference/.MISSING_LARGE_BLOBS`` lists it, with
``Data/Video/giphy-2.gif`` still present) streams frames into the
incremental ONMF dictionary. This loader reads every frame of a GIF (or
any multi-frame image PIL can open) into a (F, H, W, 3) [0, 1] array.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["load_video_frames"]


def load_video_frames(path: str, *, max_frames: int | None = None,
                      is_color: bool = True, dtype=jnp.float32):
    """Read frames of an animated image into a (F, H, W, 3) device array
    (RGB), or (F, H, W) when ``is_color=False``."""
    from PIL import Image, ImageSequence

    if max_frames is not None and max_frames <= 0:
        raise ValueError(f"max_frames must be positive, got {max_frames}")
    frames = []
    with Image.open(path) as img:
        for i, frame in enumerate(ImageSequence.Iterator(img)):
            if max_frames is not None and i >= max_frames:
                break
            f = frame.convert("RGB" if is_color else "L")
            frames.append(np.asarray(f, dtype=np.float32) / 255.0)
    return jnp.asarray(np.stack(frames), dtype)
