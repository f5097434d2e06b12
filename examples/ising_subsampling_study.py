"""The reference's Ising errors-vs-subsampling study, end to end.

Reproduces the ``ising_reconstruction.py`` workflow that its
``display_errors`` figure summarizes (``:203-221``): learn a dictionary
along an Ising MCMC trajectory at several subsampling epochs (the number
of Metropolis site updates between training rounds), then plot the
surrogate-error traces on a common axis (x rescaled to a shared update
budget, y per lattice site).

Uses ``sampler="exact"`` so the requested subsampling step counts are
honored exactly (the parallel checkerboard samplers round up to whole
sweeps — PARITY.md deviation #3).

Usage: python examples/ising_subsampling_study.py [--lattice 64]
Artifacts land in examples/out/.
"""

import argparse
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lattice", type=int, default=64)
    ap.add_argument("--rank", type=int, default=25)
    ap.add_argument("--rounds", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "out"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import numpy as np

    from onmf_ontf_ndl_tpu.apps.ising import IsingReconstructor, display_errors

    # shared burned-in start so the traces differ only by subsampling
    from onmf_ontf_ndl_tpu.samplers.ising import (checkerboard_sweeps,
                                                  init_lattice)
    import jax

    lat = init_lattice(jax.random.key(0), args.lattice)
    lat = checkerboard_sweeps(jax.random.key(1), lat, 30, T=0.5)

    traces = {}
    for steps in (1_000, 10_000, 100_000):
        t0 = time.time()
        rec = IsingReconstructor(
            n_components=args.rank, lattice_size=args.lattice,
            ising_iterations=args.rounds, temperature=0.5,
            ising_subsampling_steps=steps, sub_iterations=20,
            num_patches=500, batch_size=100, patch_size=10,
            sampler="exact", seed=0)
        _, _, errors = rec.ising_mcmc_learning(initial_lattice=lat)
        traces[f"subsampling epoch of {steps}"] = np.asarray(errors)
        print(f"steps={steps}: {args.rounds} rounds in "
              f"{time.time() - t0:.1f}s, surrogate "
              f"{float(errors[0]):.0f} -> {float(errors[-1]):.0f}")

    path = os.path.join(args.out, "ising_errors_subsampling.png")
    display_errors(traces, lattice_sites=float(args.lattice ** 2),
                   total_updates=float(args.rounds), save_path=path)
    print(f"figure: {path}")


if __name__ == "__main__":
    main()
