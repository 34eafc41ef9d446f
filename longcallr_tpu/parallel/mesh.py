"""Device-mesh parallelism for the phasing engine.

Replaces the reference's rayon thread-pool data parallelism over regions
(``longcallR/src/thread.rs:52-77``) with JAX sharding over a device mesh:

  * **regions axis** (data parallel): a batch of padded regions is sharded
    across devices; every phasing half-step is a vmapped kernel, so XLA runs
    each device's shard independently — no collectives needed, like the
    reference's embarrassingly-parallel rayon loop but across chips.
  * **reads axis** (the "sequence/tensor parallel" analog): a single huge
    region's fragment matrix is sharded along reads; per-SNP sums become
    `psum` reductions over the reads axis inside ``shard_map``, so one locus
    with hundreds of thousands of reads scales across ICI.

Mesh axes: ("regions", "reads").
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..phasing.kernels import CellTables, f64
from ..phasing.optimize import PhaseState, _sigma_step, _snp_step


def make_mesh(n_regions_axis: Optional[int] = None,
              n_reads_axis: Optional[int] = None,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_regions_axis is None:
        n_reads_axis = n_reads_axis or 1
        n_regions_axis = n // n_reads_axis
    if n_reads_axis is None:
        n_reads_axis = n // n_regions_axis
    assert n_regions_axis * n_reads_axis == n
    return Mesh(devices.reshape(n_regions_axis, n_reads_axis),
                axis_names=("regions", "reads"))


class BatchedRegions(NamedTuple):
    """A bucket of B same-shape padded regions."""

    p: jnp.ndarray         # [B,K,I] f64
    lerr: jnp.ndarray      # [B,K,I] f64
    l1m: jnp.ndarray       # [B,K,I] f64
    exists: jnp.ndarray    # [B,K,I] bool
    read_base: jnp.ndarray  # [B,K] bool
    site_mask: jnp.ndarray  # [B,I] bool
    conserved: jnp.ndarray  # [B,I] bool


def _one_region_step(p, lerr, l1m, exists, read_base, site_mask, conserved,
                     sigma, delta, eta, with_genotype: bool,
                     keep_conserved: bool):
    ct = CellTables(p=p, lerr=lerr, l1m=l1m, exists=exists)
    st = PhaseState(sigma, delta, eta)
    new_sigma, s_inc = _sigma_step(ct, st, read_base, site_mask)
    st = st._replace(sigma=new_sigma)
    new_delta, new_eta, d_inc = _snp_step(ct, st, read_base, site_mask,
                                          conserved, with_genotype,
                                          keep_conserved)
    return new_sigma, new_delta, new_eta, s_inc | d_inc


@partial(jax.jit, static_argnames=("with_genotype", "keep_conserved", "mesh"))
def batched_phase_step(batch: BatchedRegions, sigma, delta, eta,
                       with_genotype: bool = False,
                       keep_conserved: bool = False,
                       mesh: Optional[Mesh] = None):
    """One full coordinate-ascent sweep over a batch of regions.

    With a mesh, the batch axis is sharded over "regions": each device runs
    its own regions' sweep (pure data parallelism, zero collectives)."""
    fn = jax.vmap(partial(_one_region_step, with_genotype=with_genotype,
                          keep_conserved=keep_conserved))
    args = (batch.p, batch.lerr, batch.l1m, batch.exists, batch.read_base,
            batch.site_mask, batch.conserved, sigma, delta, eta)
    if mesh is not None:
        shardings = []
        for a in args:
            spec = P("regions", *([None] * (a.ndim - 1)))
            shardings.append(NamedSharding(mesh, spec))
        args = tuple(jax.lax.with_sharding_constraint(a, s)
                     for a, s in zip(args, shardings))
    return fn(*args)


def read_sharded_snp_sums(mesh: Mesh):
    """Per-SNP masked sums for ONE giant region with the reads axis sharded
    across the mesh's "reads" axis; partial sums are reduced with psum.

    Returns a jitted fn(p, lerr, l1m, sigma, read_mask, site_mask, delta)
    → (s_match, s_flip, s_refe, s_alte, cov), each replicated [I].
    """

    def local_sums(p, lerr, l1m, sigma, read_mask, site_mask, delta):
        m = site_mask[None, :] & (p != 0) & read_mask[:, None]
        x = sigma[:, None] * delta[None, :]
        term = lambda xv: jnp.where(p == xv, l1m, lerr)
        s_match = jnp.where(m, term(x), 0.0).sum(axis=0)
        s_flip = jnp.where(m, term(-x), 0.0).sum(axis=0)
        s_refe = jnp.where(m, term(1.0), 0.0).sum(axis=0)
        s_alte = jnp.where(m, term(-1.0), 0.0).sum(axis=0)
        cov = m.sum(axis=0)
        out = (s_match, s_flip, s_refe, s_alte, cov.astype(jnp.int64))
        return tuple(jax.lax.psum(o, axis_name="reads") for o in out)

    spec_ki = P("reads", None)
    spec_k = P("reads")
    spec_i = P(None)
    fn = shard_map(
        local_sums, mesh=mesh,
        in_specs=(spec_ki, spec_ki, spec_ki, spec_k, spec_k, spec_i, spec_i),
        out_specs=(spec_i,) * 5,
        check_rep=False,
    )
    return jax.jit(fn)
