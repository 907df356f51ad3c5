"""Multi-chip scaling: MSM and trusted-setup generation over a device mesh.

The reference's only parallelism is a std::thread fan-out over setup ranges
(trusted_setup.cpp:39-73) and its MSMs are serial loops. Here the *coefficient
axis* is the scaling axis (the degree-scaling analogue of sequence
parallelism): scalars and setup points shard over a 1-D mesh via shard_map,
every device runs the full Pippenger bucket pipeline on its shard, and the
per-device partial sums — a single group element each — are combined with an
all_gather over ICI plus a log-depth tree of complete additions (EC addition
is not linear, so this replaces the psum a tensor workload would use).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.msm import MSMEngine


def _leaf_spec(leaf, axis_name):
    """PartitionSpec sharding the last (coefficient) axis of a field leaf."""
    return P(*([None] * (leaf.ndim - 1) + [axis_name]))


def sharded_msm(eng: MSMEngine, mesh: Mesh, axis_name: str = "data"):
    """Build a pjit-able MSM over `mesh`: scalars (L, n) and point batch
    (n,) sharded on n; returns the total as a replicated point."""
    J = eng.J

    def local(scalars, points):
        part = eng.msm(scalars, points)           # this shard's partial sum
        parts = jax.lax.all_gather(part, axis_name)   # leaves: (d, ...)
        d = parts["x"].shape[0]
        acc = {k: v[0] for k, v in parts.items()}
        for i in range(1, d):
            acc = J.add(acc, {k: v[i] for k, v in parts.items()})
        return acc

    def make_specs(scalars, points):
        in_specs = (P(None, axis_name),
                    {k: _leaf_spec(v, axis_name) for k, v in points.items()})
        out_specs = {k: P(*([None] * (v.ndim - 1)))
                     for k, v in jax.eval_shape(
                         lambda s, p: eng.msm(s, p), scalars, points).items()}
        return in_specs, out_specs

    def run(scalars, points):
        in_specs, out_specs = make_specs(scalars, points)
        f = shard_map(local, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)
        return f(scalars, points)

    return run


def sharded_setup_powers(curve, mesh: Mesh, axis_name: str = "data"):
    """Sharded trusted-setup element generation: the bit matrix of the
    s-powers shards on the element axis; every device computes its range of
    s^i * G via the shared double-table (the reference's thread fan-out,
    TPU-style)."""

    def local(bits, table):
        return curve.mul_bits_table(bits, table)

    def run(bits, table):
        nb = bits.shape[0]
        in_specs = (P(None, axis_name),
                    jax.tree.map(lambda v: P(*([None] * v.ndim)), table))
        out_specs = jax.tree.map(
            lambda v: _leaf_spec(v, axis_name),
            jax.eval_shape(lambda b, t: curve.mul_bits_table(b, t),
                           bits, table))
        f = shard_map(local, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)
        return f(bits, table)

    return run


def make_mesh(n_devices: int, axis_name: str = "data") -> Mesh:
    devs = np.array(jax.devices()[:n_devices])
    return Mesh(devs, (axis_name,))
