"""Network dictionary learning on a heavy-tailed (power-law) graph.

Every real large network is degree-skewed — hubs orders of magnitude
above the median degree. This walkthrough runs the full NDL pipeline
(`/root/reference/network_reconstruction_nx.py` semantics) on a
million-scale Barabási–Albert graph with the scale machinery this
framework adds:

1. O(E) `CsrGraph` ingest through the C++ builder
   (`native/graph_loader.cpp`; sub-second at a million nodes) with an
   optional built-CSR npz cache;
2. Glauber-chain dictionary learning — hub rows route through the
   sorted-multiplicity intersection kernel (`samplers/motif.py`: one
   sort of the constraint rows instead of per-candidate binary
   search; reconstruction-sized pair fetches take the sort-join
   membership kernel, small ones the binary search);
3. Pivot-chain reconstruction, the reference's own recommended
   real-network configuration ("keep false to use Pivot chain for
   recons.", `network_reconstruction_nx.py:573-574`), over a wide
   chain ensemble;
4. accuracy + learned-dictionary figure.

For a real dataset, replace `ba_edges` with
`data.graphs.load_edgelist_csr("path/to/edges.txt")` (SNAP-style files
parse as-is).

Usage: python examples/ndl_heavy_tail.py [--nodes N] [--cpu]
"""

import argparse
import os
import sys
import time


def ba_edges(n, m=2, seed=0, chunk=4096):
    """Vectorized preferential attachment — single source of truth in
    ``benchmarks/scale_extras.py`` (imported, not copied, so the
    staleness-cap logic and the n > m >= 1 validation live in one
    place; scale_extras has no heavyweight module-level imports)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks"))
    from scale_extras import ba_edges as _ba_edges
    return _ba_edges(n, m=m, seed=seed, chunk=chunk)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=200_000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "out"))
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from onmf_ontf_ndl_tpu.apps.network import NetworkReconstructor
    from onmf_ontf_ndl_tpu.data.graphs import csr_graph_from_edges

    os.makedirs(args.out_dir, exist_ok=True)
    float(jnp.sum(jnp.ones(8)))                 # backend handshake

    t0 = time.time()
    g = csr_graph_from_edges(ba_edges(args.nodes))
    print(f"BA graph: {g.num_nodes:,} nodes, {g.num_edges:,} edges, "
          f"max_deg {g.max_deg:,} (mean {2 * g.num_edges / g.num_nodes:.1f}) "
          f"built in {time.time() - t0:.1f}s", file=sys.stderr)

    rec = NetworkReconstructor(
        source=g, n_components=25, MCMC_iterations=40, sub_iterations=30,
        sample_size=400, batch_size=100, k1=0, k2=2, num_chains=16,
        fast=True, seed=0,
        is_glauber_dict=True,        # Glauber for dictionary learning
        is_glauber_recons=False,     # Pivot chain for reconstruction
    )
    t0 = time.time()
    rec.train_dict()
    float(jnp.sum(rec.W))
    print(f"trained in {time.time() - t0:.1f}s (incl. compile)",
          file=sys.stderr)

    t0 = time.time()
    rec.reconstruct_network(recons_iter=max(5 * args.nodes, 200_000),
                            num_chains=4096)
    acc = float(rec.compute_recons_accuracy())
    print(f"reconstruction accuracy {acc:.4f} in {time.time() - t0:.1f}s "
          f"(incl. compile)", file=sys.stderr)

    fig = os.path.join(args.out_dir, "heavy_tail_dict.png")
    rec.display_dict(title=f"BA {g.num_nodes:,} nodes — accuracy {acc:.3f}",
                     save_filename=fig)
    print(f"dictionary figure: {fig}", file=sys.stderr)


if __name__ == "__main__":
    main()
