"""Reproduce the reference's flagship figure workflow
(``image_reconstruction.py:479-518``): train color dictionaries on one
painting at several training lengths, reconstruct another painting with
each, and build the multi-stage comparison panel.

Usage: python examples/image_gallery.py [--data /root/reference/Data]
Artifacts land in examples/out/.
"""

import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/Data")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "out"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax.numpy as jnp
    from onmf_ontf_ndl_tpu.apps.image import ImageReconstructor
    from onmf_ontf_ndl_tpu.data.images import load_image
    from onmf_ontf_ndl_tpu.utils import viz

    path_dict_img = f"{args.data}/piccaso/0.jpg"
    path_recons = f"{args.data}/renoir/0.jpg"
    training_iter_list = [2, 20, 200]
    W_list, recons_list = [], []

    for training_iter in training_iter_list:
        t0 = time.time()
        rec = ImageReconstructor(
            path=path_dict_img, n_components=25, iterations=training_iter,
            sub_iterations=10, patch_size=10, batch_size=10, num_patches=10,
            is_color=True, fast=True)
        rec.train_dict()
        out = rec.reconstruct_image_color(path=path_recons,
                                          recons_resolution=5)
        print(f"iters={training_iter}: {time.time()-t0:.1f}s")
        W_list.append(np.asarray(rec.W))
        recons_list.append(np.asarray(out))
        viz.display_dictionary(
            rec.W, 10, is_color=True,
            save_path=f"{args.out}/dict_iter{training_iter}.png")

    originals = [np.asarray(load_image(path_recons)),
                 np.asarray(load_image(path_dict_img))]
    viz.display_recons_panel(
        W_list, recons_list, originals, 10,
        save_path=f"{args.out}/dict_recons_list.png",
        title="ONMF dictionaries and reconstructions vs training length")
    print(f"artifacts in {args.out}")


if __name__ == "__main__":
    main()
