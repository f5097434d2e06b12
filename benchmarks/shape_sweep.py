"""Kernel/trainer characterization OFF the headline shape.

The standing MFU-floor argument (docs/DESIGN.md §2, BENCH_r*.json) was
measured at exactly one shape — r=25 (padded to 32, 1/4 of the MXU's
128 sublanes), d=300. The reference's own configs also run rank 100
(`/root/reference/ising_reconstruction.py:223-232`, 20x20 patches ->
d=400) and d=441 NDL patches (k=21 arms, `network_reconstruction_nx.py:
536-574`), where the row matvec uses 4x more of the MXU and the floor
claim is materially tested. This sweep measures the REAL fused trainer
(`train_dict`, block sampling, fixed 10 sweeps) across the reference's
(rank, d) config space plus a rank-scaling probe, for both coder
modes, and a `block_rows` microsweep of the standalone coder kernel
per shape (retune evidence).

Writes `results.json: shape_sweep`. Run manually (TPU):
    python benchmarks/shape_sweep.py [--quick]
"""

import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "results.json")
PEAK_FLOPS_BF16 = 197e12     # TPU v5e bf16 MXU peak
SUB_ITER = 10

# (label, d, r) — the reference's config space + a rank-scaling probe
SHAPES = [
    ("r25_d300_color10", 300, 25),    # headline: 10x10x3 color, rank 25
    ("r25_d100_gray10", 100, 25),     # grayscale 10x10
    ("r100_d400_ising20", 400, 100),  # ising driver: 20x20, rank 100
    ("r25_d441_ndl_k21", 441, 25),    # NDL k1=0,k2=20 -> 21x21 patches
    ("r100_d300", 300, 100),          # rank scaling at fixed d
]


def flops_per_patch(d, r, sub_iter=SUB_ITER):
    # same analytic model as bench.py: proj + sweeps + aggregates,
    # per-patch terms only
    return 4 * d * r + 2 * (sub_iter + 1) * r * r


def measure_train(d, r, batch, coder, iters=None):
    import jax
    import jax.numpy as jnp
    from onmf_ontf_ndl_tpu.models.onmf import train_dict
    from onmf_ontf_ndl_tpu.models.state import init_state

    iters = iters or max(400, 8_000_000 // batch)
    pool = jax.random.uniform(jax.random.key(1), (d, 8192))
    state = init_state(jax.random.key(0), d, r)

    def run(st):
        st, _ = train_dict(st, pool, iterations=iters + 1,
                           batch_size=batch, alpha=0.0, beta=1.0,
                           sub_iter=SUB_ITER, stopping_diff=None,
                           track_code=False, coder=coder,
                           sampling="block")
        return st

    st = run(state)
    float(jnp.sum(st.W))                       # fence (axon: fetch)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        st = run(state)
        float(jnp.sum(st.W))
        best = min(best, time.perf_counter() - t0)
    return iters * batch / best


def measure_kernel_block_rows(d, r, batch, bk, reps=300):
    """Standalone fixed-sweep coder kernel at a given Gauss-Seidel
    block size — the retune microbench (same math at every bk;
    ops/pallas/coder_kernel.py)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from onmf_ontf_ndl_tpu.ops.pallas.coder_kernel import coder_sweeps

    W = jax.random.uniform(jax.random.key(0), (d, r))
    X = jax.random.uniform(jax.random.key(1), (d, batch))
    gram = W.T @ W
    proj = W.T @ X
    H0 = jax.random.uniform(jax.random.key(2), (r, batch))

    @jax.jit
    def many():
        def body(c, _):
            H = coder_sweeps(gram, proj + c * 0, H0, 0.5,
                             sub_iter=SUB_ITER, block_rows=bk)
            return jnp.sum(H) * 1e-20, ()

        c, _ = lax.scan(body, jnp.float32(0), (), length=reps)
        return c

    float(many())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many())
        best = min(best, time.perf_counter() - t0)
    return reps * batch / best


def measure_step_prefixes(d, r, batch, reps=None, interpret=False):
    """Fused-prefix decomposition of the bcd trainer step: where does
    the trainer-vs-kernel-only gap go at rank 100 (round-4 verdict #8:
    35.2M patches/s trainer vs 42M standalone kernel at r=100/d=400)?

    Times PREFIXES of the real per-step pipeline inside one fused scan
    (CLAUDE.md: an isolated per-phase jit measures ~100x wrong on this
    hardware because dead-output layouts change) — successive
    differences attribute the per-step wall to (1) gram+projection
    matmuls, (2) coder sweeps, (3) streaming aggregate updates, and
    (4) the column-BCD dictionary update (``onmf_step``'s stale-
    aggregate default, models/onmf.py). Pool width equals the batch so
    block sampling is the identity slice (its cost is ~0 in the real
    trainer too; docs/DESIGN.md §2)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from onmf_ontf_ndl_tpu.ops.pallas.coder_kernel import (
        coder_sweeps, dict_update_sweep)

    reps = reps or max(400, 8_000_000 // batch)
    X = jax.random.uniform(jax.random.key(1), (d, batch))
    W0 = jax.random.uniform(jax.random.key(0), (d, r))
    W0 = W0 / jnp.linalg.norm(W0, axis=0)
    H0 = jax.random.uniform(jax.random.key(2), (r, batch))
    A0 = jnp.zeros((r, r))
    B0 = jnp.zeros((r, d))
    alpha = jnp.float32(0.0)

    def make(depth):
        def body(carry, i):
            W, A, B, acc = carry
            # anti-hoist: without this, a prefix that never updates W
            # would let XLA hoist gram/proj out of the scan entirely
            Wc = W + acc * 0
            gram = Wc.T @ Wc
            proj = Wc.T @ X
            acc = acc + jnp.sum(gram) * 1e-20 + jnp.sum(proj) * 1e-20
            if depth >= 2:
                H = coder_sweeps(gram, proj, H0, alpha,
                                 sub_iter=SUB_ITER, block_rows=2,
                                 interpret=interpret)
                acc = acc + jnp.sum(H) * 1e-20
            if depth >= 3:
                w = 1.0 / (1.0 + i.astype(jnp.float32))
                A1 = (1 - w) * A + w * (H @ H.T) / batch
                B1 = (1 - w) * B + w * (H @ X.T) / batch
                acc = acc + jnp.sum(A1) * 1e-20 + jnp.sum(B1) * 1e-20
                A, B = A1, B1
            if depth >= 4:
                # stale-aggregate default: W steps with the pre-update
                # A, B (models/onmf.py dict_from="stale")
                W = dict_update_sweep(W, A, B, interpret=interpret)
            return (W, A, B, acc), ()

        @jax.jit
        def run():
            carry, _ = lax.scan(
                body, (W0, A0, B0, jnp.float32(0.0)),
                jnp.arange(reps, dtype=jnp.int32))
            return carry[3] + jnp.sum(carry[0])

        return run

    out = {}
    names = ["gram_proj", "coder", "aggregates", "dict_update"]
    prev = 0.0
    for depth in (1, 2, 3, 4):
        run = make(depth)
        float(run())                       # compile + fence
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run())
            best = min(best, time.perf_counter() - t0)
        us = best / reps * 1e6
        out[f"prefix{depth}_us_per_step"] = round(us, 1)
        out[f"{names[depth - 1]}_us"] = round(us - prev, 1)
        print(f"  prefix {depth} ({'+'.join(names[:depth])}): "
              f"{us:.1f} us/step (+{us - prev:.1f})", file=sys.stderr)
        prev = us
    out["batch"] = batch
    out["patches_per_s_full_step"] = round(batch / (prev / 1e6))
    return out


def _write_record(key, value):
    """Merge one record into ``results.json`` (read at write time, not
    process start — a record committed while a long sweep is in flight
    survives) and re-render the generated doc tables atomically."""
    results = {}
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                results = json.load(f)
        except (OSError, json.JSONDecodeError):
            results = {}
    results[key] = value
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    import subprocess
    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "gen_tables.py")], check=False)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="one batch, no block_rows sweep")
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[16384, 65536])
    ap.add_argument("--decomp", action="store_true",
                    help="fused-prefix step decomposition at the "
                         "r=100 ising shape + the headline shape "
                         "(writes results.json: trainer_step_decomp)")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    float(jnp.sum(jnp.ones(8)))          # backend handshake off the clock
    print(f"backend: {jax.devices()[0].platform}", file=sys.stderr)

    if args.decomp:
        decomp = {}
        for label, d, r in (("r100_d400_ising20", 400, 100),
                            ("r25_d300_color10", 300, 25)):
            print(f"{label} step decomposition:", file=sys.stderr)
            decomp[label] = measure_step_prefixes(d, r, 65536)
        _write_record("trainer_step_decomp", decomp)
        print(json.dumps({"trainer_step_decomp": decomp}))
        return

    batches = args.batches[:1] if args.quick else args.batches
    sweep = {}
    for label, d, r in SHAPES:
        fpp = flops_per_patch(d, r)
        entry = {"d": d, "r": r, "flops_per_patch": fpp}
        for coder in ("bcd", "fista", "fista_bf16"):
            # bcd (the parity coder) sweeps the batch grid; the fista
            # modes are measured at the widest batch only (their best
            # point at the headline shape) to bound the compile count
            coder_batches = batches if coder == "bcd" else batches[-1:]
            best, best_b = 0.0, None
            for b in coder_batches:
                pps = measure_train(d, r, b, coder)
                print(f"{label} {coder} batch {b}: {pps / 1e6:.1f}M "
                      f"patches/s", file=sys.stderr)
                if pps > best:
                    best, best_b = pps, b
            entry[f"{coder}_patches_per_s"] = round(best)
            entry[f"{coder}_batch"] = best_b
            entry[f"{coder}_mfu_bf16_peak"] = round(
                best * fpp / PEAK_FLOPS_BF16, 5)
        if not args.quick:
            br = {}
            for bk in (1, 2, 4, 8):
                if bk > r:
                    continue
                pps = measure_kernel_block_rows(d, r, batches[-1], bk)
                br[str(bk)] = round(pps)
                print(f"{label} kernel block_rows={bk}: "
                      f"{pps / 1e6:.1f}M patches/s", file=sys.stderr)
            entry["kernel_block_rows_patches_per_s"] = br
        sweep[label] = entry

    # atomic record→table refresh: the MFU-vs-rank tables render from
    # this record
    _write_record("shape_sweep", sweep)
    print(json.dumps({"shape_sweep": sweep}))


if __name__ == "__main__":
    main()
