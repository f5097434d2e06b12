"""Network dictionary learning gallery: learn motif dictionaries on the
reference's torus and facebook graphs and save the k x k atom grids (the
reference's ``display_dict`` figures,
``network_reconstruction_nx.py:393-419``) plus the code-covariance matrix.

Usage: python examples/ndl_gallery.py [--data /root/reference/Data]
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

    from onmf_ontf_ndl_tpu.apps.network import NetworkReconstructor
    from onmf_ontf_ndl_tpu.data.graphs import graph_from_adjacency
    from onmf_ontf_ndl_tpu.utils import viz

    # torus, k=3 path motif — the paper's canonical mesoscale example
    A = np.genfromtxt(f"{args.data}/torus_adj.txt")
    t0 = time.time()
    rec = NetworkReconstructor(
        source=graph_from_adjacency(A), n_components=25, MCMC_iterations=50,
        sub_iterations=50, sample_size=500, batch_size=20, k1=0, k2=2,
        alpha=0.1, fast=True, num_chains=8, is_glauber_recons=False)
    rec.train_dict()
    rec.reconstruct_network(recons_iter=20000, num_chains=64)
    acc = rec.compute_recons_accuracy()
    print(f"torus: {time.time()-t0:.1f}s, recon accuracy {acc:.3f}")
    viz.display_network_dictionary(
        rec.W, 3, title=f"Torus 3x3 motif dictionary (recon acc {acc:.2f})",
        save_path=f"{args.out}/ndl_torus_dict.png")
    rec.show_cov(save_path=f"{args.out}/ndl_torus_code_cov.png")

    # facebook, 21-node path motif — the reference main() configuration
    t0 = time.time()
    fb = NetworkReconstructor(
        source=f"{args.data}/Networks/facebook_combined.txt",
        n_components=25, MCMC_iterations=20, sub_iterations=50,
        sample_size=512, batch_size=20, k1=0, k2=20, alpha=1.0,
        fast=True, num_chains=8, is_glauber_recons=False)
    fb.train_dict()
    print(f"facebook k=21: {time.time()-t0:.1f}s")
    viz.display_network_dictionary(
        fb.W, 21, title="Facebook 21x21 motif dictionary",
        save_path=f"{args.out}/ndl_facebook_dict.png")
    print(f"artifacts in {args.out}")


if __name__ == "__main__":
    main()
