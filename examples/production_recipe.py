"""Production training recipe: the full deployment story in one script.

Demonstrates, end to end:

1. a device mesh (`make_mesh`) — all local chips (run with
   ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` + CPU backend
   to try multi-device behavior without hardware; on a real pod slice,
   wrap with `parallel.multihost.initialize()` first);
2. data-parallel training (`dp_train_dict`) — psum'd sufficient
   statistics, exactly equal to the single-chip run on the concatenated
   batch;
3. the FISTA production coder (`coder="fista"`) — fully MXU-parallel,
   equal-or-better coding objective (docs/DESIGN.md §2);
4. periodic full-state checkpointing + exact resume (PRNG key and
   t^-beta schedule included: the resumed run is bitwise the
   uninterrupted one).

Usage: python examples/production_recipe.py [--devices N] [--cpu]
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="force N virtual CPU devices (0 = use platform)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    if args.cpu or args.devices:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from onmf_ontf_ndl_tpu.models.state import init_state
    from onmf_ontf_ndl_tpu.parallel.mesh import make_mesh
    from onmf_ontf_ndl_tpu.parallel.dp import dp_train_dict, shard_batch
    from onmf_ontf_ndl_tpu.utils.checkpoint import load_state, save_state

    ndev = len(jax.devices())
    mesh = make_mesh({"dp": ndev})
    print(f"mesh: {ndev} x {jax.devices()[0].platform}")

    # synthetic sparse-dictionary stream
    rng = np.random.default_rng(0)
    d, r = 128, 32
    n = 4096 * ndev  # divisible over the dp axis
    Wt = np.abs(rng.standard_normal((d, r)))
    Wt /= np.linalg.norm(Wt, axis=0)
    X = jnp.asarray(
        Wt @ (np.abs(rng.standard_normal((r, n)))
              * (rng.random((r, n)) < 0.3)) + 0.01 * rng.random((d, n)),
        jnp.float32)

    ckpt = os.environ.get("CKPT", "/tmp/onmf_production_state.npz")
    chunk_iters, total_chunks = 50, 5

    # crash-resume-safe training: a STABLE checkpoint path plus a resume
    # branch — rerunning this script after a crash picks up where the
    # last completed chunk left off (the checkpoint carries the PRNG key
    # and the t^-beta schedule counter, so the resumed run is exactly
    # the uninterrupted one)
    if os.path.exists(ckpt):
        state = load_state(ckpt)
        done = int(round(float(state.t))) // chunk_iters
        print(f"resuming from {ckpt}: t={float(state.t):.0f} "
              f"({done}/{total_chunks} chunks done)")
    else:
        state = init_state(jax.random.key(0), d, r)
        done = 0

    X = shard_batch(mesh, X)               # place once, outside the loop
    for chunk in range(done, total_chunks):
        state = dp_train_dict(
            mesh, state, X,
            iterations=chunk_iters, batch_size_per_device=512,
            coder="fista", sub_iter=20)
        save_state(ckpt, state)
        print(f"chunk {chunk}: t={float(state.t):.0f}  "
              f"checkpointed -> {ckpt}")

    # quality: code the stream against the learned dictionary
    from onmf_ontf_ndl_tpu.ops.coder import nonneg_code

    H = nonneg_code(X, state.W, key=jax.random.key(1), alpha=0.0,
                    sub_iter=20, stopping_diff=None, method="fista")
    err = float(jnp.linalg.norm(X - state.W @ H) / jnp.linalg.norm(X))
    print(f"recon rel err: {err:.4f}")


if __name__ == "__main__":
    main()
