"""Fused Pallas checkerboard-Ising kernel.

Runs an arbitrary number of red/black heat-bath sweeps entirely on-chip:
the lattice lives in VMEM, per-site randomness comes from the TPU PRNG
(``pltpu.prng_random_bits``), and the sweep loop is a ``fori_loop``
inside one kernel — no per-sweep XLA dispatch. Same update rule and
stationary distribution as
:func:`onmf_ontf_ndl_tpu.samplers.ising.checkerboard_sweeps` (heat-bath
acceptance ``1/(1+exp(dE/T))`` on alternating parities); the random
stream differs (TPU PRNG vs jax.random), so parity is distributional.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["checkerboard_sweeps_pallas"]


def _torus_neighbor_sum(lat):
    n0, n1 = lat.shape
    # pltpu.roll requires non-negative shifts; -1 == n-1 on the torus
    return (pltpu.roll(lat, 1, 0) + pltpu.roll(lat, n0 - 1, 0)
            + pltpu.roll(lat, 1, 1) + pltpu.roll(lat, n1 - 1, 1))


def _kernel(seed_ref, params_ref, lat_ref, out_ref, *, nsweeps):
    pltpu.prng_seed(seed_ref[0])
    n = lat_ref.shape[0]
    ii = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    parity = (ii + jj) % 2
    Jf = params_ref[0]
    Hf = params_ref[1]
    inv_T = params_ref[2]

    def half(lat, color):
        sn = _torus_neighbor_sum(lat)
        dE = 2.0 * lat * (Hf + Jf * sn)
        bits = pltpu.bitcast(pltpu.prng_random_bits((n, n)), jnp.uint32)
        # uniform in [0, 1) from the top 24 bits; route the cast through
        # int32 (uint32 -> f32 casts are unsupported by Mosaic; the
        # shifted value fits in 24 bits so the int32 view is exact)
        u = (pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32)
             * jnp.float32(1.0 / (1 << 24)))
        p_flip = jax.nn.sigmoid(-dE * inv_T)
        accept = jnp.logical_and(parity == color, u < p_flip)
        return jnp.where(accept, -lat, lat)

    def sweep(_, lat):
        lat = half(lat, 0)
        return half(lat, 1)

    out_ref[...] = lax.fori_loop(0, nsweeps, sweep, lat_ref[...])


@functools.partial(jax.jit, static_argnames=("nsweeps", "interpret"))
def checkerboard_sweeps_pallas(
    seed: jax.Array,
    lattice: jax.Array,
    nsweeps: int,
    J: float = 1.0,
    H: float = 0.0,
    T: float = 0.5,
    *,
    interpret: bool = False,
) -> jax.Array:
    """All-on-chip checkerboard sweeps.

    Args:
      seed: int32 scalar PRNG seed.
      lattice: (n, n) +-1 spins, n even; whole lattice must fit VMEM
        (n <= ~1500 in f32).
    Returns the (n, n) int8 lattice after ``nsweeps`` full sweeps.
    """
    if lattice.ndim != 2 or lattice.shape[0] != lattice.shape[1]:
        raise ValueError(
            f"checkerboard_sweeps_pallas needs a square (n, n) lattice, "
            f"got {lattice.shape}")
    n = lattice.shape[0]
    if n % 2 != 0:
        raise ValueError("even lattice side required")
    lat_f = lattice.astype(jnp.float32)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    params = jnp.stack([jnp.asarray(J, jnp.float32),
                        jnp.asarray(H, jnp.float32),
                        1.0 / jnp.asarray(T, jnp.float32)])
    out = pl.pallas_call(
        functools.partial(_kernel, nsweeps=int(nsweeps)),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(seed_arr, params, lat_f)
    return out.astype(jnp.int8)
