"""Lattice-sharded checkerboard Ising sweeps with halo exchange.

The closest analogue of sequence/context parallelism for this framework
(SURVEY.md §2/§5): the 2-D lattice is row-sharded across the mesh axis,
and each checkerboard half-sweep exchanges one boundary row with each
neighbor shard via ``lax.ppermute`` (a ring halo exchange over ICI)
before computing the local neighbor sums. Update rule and stationary
distribution are identical to the single-device
:func:`~onmf_ontf_ndl_tpu.samplers.ising.checkerboard_sweeps`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from onmf_ontf_ndl_tpu.samplers.ising import delta_e

__all__ = ["sharded_checkerboard_sweeps"]


def _halo_neighbor_sum(lat_f, axis):
    """Neighbor sum where the up/down neighbors at shard boundaries come
    from adjacent shards via a ring ppermute (torus wrap included)."""
    ndev = lax.axis_size(axis)
    up_row = lat_f[:1]       # my first row -> needed by my upper neighbor
    dn_row = lat_f[-1:]      # my last row  -> needed by my lower neighbor
    # receive lower neighbor's first row (my halo below) and upper
    # neighbor's last row (my halo above)
    fwd = [(i, (i + 1) % ndev) for i in range(ndev)]
    bwd = [(i, (i - 1) % ndev) for i in range(ndev)]
    halo_above = lax.ppermute(dn_row, axis, fwd)   # row above my block
    halo_below = lax.ppermute(up_row, axis, bwd)   # row below my block
    up = jnp.concatenate([halo_above, lat_f[:-1]], axis=0)
    down = jnp.concatenate([lat_f[1:], halo_below], axis=0)
    left = jnp.roll(lat_f, 1, 1)
    right = jnp.roll(lat_f, -1, 1)
    return up + down + left + right


def sharded_checkerboard_sweeps(
    mesh: Mesh,
    key: jax.Array,
    lattice: jax.Array,
    nsweeps: int,
    J: float = 1.0,
    H: float = 0.0,
    T: float = 0.5,
    axis: str = "dp",
):
    """Run checkerboard heat-bath sweeps on a lattice row-sharded over
    ``axis``. Requires even lattice side and rows divisible by the axis
    size (each shard gets an equal row block)."""
    n = lattice.shape[0]
    ndev = mesh.shape[axis]
    if n % 2 != 0:
        raise ValueError("even lattice side required")
    if n % ndev != 0 or (n // ndev) % 2 != 0:
        raise ValueError("rows per shard must be even and equal")
    Jf, Hf, Tf = jnp.float32(J), jnp.float32(H), jnp.float32(T)

    def local(key, lat):
        me = lax.axis_index(axis)
        rows = lat.shape[0]
        row0 = me * rows
        ii = jax.lax.broadcasted_iota(jnp.int32, lat.shape, 0) + row0
        jj = jax.lax.broadcasted_iota(jnp.int32, lat.shape, 1)
        parity = (ii + jj) % 2

        def half(lat, color, k):
            s = lat.astype(jnp.float32)
            sn = _halo_neighbor_sum(s, axis)
            dE = delta_e(s, sn, Jf, Hf)
            u = jax.random.uniform(k, lat.shape)
            accept = jnp.logical_and(parity == color,
                                     u < jax.nn.sigmoid(-dE / Tf))
            return jnp.where(accept, -lat, lat)

        def sweep(lat, k):
            k0, k1 = jax.random.split(k)
            lat = half(lat, 0, k0)
            lat = half(lat, 1, k1)
            return lat, None

        # every shard derives distinct randomness from the shared key
        key = jax.random.fold_in(key, me)
        keys = jax.random.split(key, nsweeps)
        lat, _ = lax.scan(sweep, lat, keys)
        return lat

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )
    lattice = jax.device_put(
        lattice, NamedSharding(mesh, P(axis, None)))
    return jax.jit(fn, static_argnames=())(key, lattice)
