"""Collective statistics: psum-reduced histograms over a sharded volume.

The reference accumulates samples in a single-thread std::vector and sorts
(DetermineHistogramBinEdges_...cxx:219-296) — the multi-host equivalent
reduces per-shard dense histograms with `psum` and derives quantile edges
from the reduced counts (SURVEY.md §2.4 / §7 hard-part 4). Exact
sort-based edges remain available on a single host via
ife_tpu.stats.equalize.
"""
from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ife_tpu.parallel.mesh import volume_pspec
from ife_tpu.stats.histogram import histogram_counts


def sharded_masked_histogram(
    values: jax.Array,
    mask: jax.Array,
    edges: jax.Array,
    mesh: Mesh,
) -> jax.Array:
    """Global histogram counts of masked voxels of a sharded volume.

    values: (X, Y, Z) sharded; mask: (X, Y, Z) sharded; edges: (E,)
    replicated. Returns replicated (E+1,) int32 counts == the single-device
    histogram of values[mask != 0] (integer accumulation + integer psum:
    exact at production sizes, unlike an f32 accumulator which drops
    increments past 2^24 per bin).
    """
    pspec = volume_pspec(mesh)

    def block(v, m, e):
        w = (m != 0).astype(jnp.int32)
        local = histogram_counts(v, e, w)
        for name in mesh.axis_names:
            local = jax.lax.psum(local, name)
        return local

    fn = shard_map(
        block, mesh=mesh, in_specs=(pspec, pspec, P(None)), out_specs=P(None)
    )
    return fn(values, mask, edges)


def histogram_quantile_edges(
    counts: np.ndarray, edges: np.ndarray, n_bins: int
) -> np.ndarray:
    """Approximate equal-frequency edges from reference-convention counts.

    Adapter over the one CDF-inversion spec, stats.equalize
    .edges_from_dense_counts: `counts` has E+1 entries for E edges (the
    reference bin convention with unbounded tail bins); the tails are
    assigned synthetic finite boundaries one interior-bin-width out, and
    the piecewise-linear CDF is inverted at the n_bins-1 interior
    quantiles. The scalable replacement for the exact global sort
    (documented approximation switch, SURVEY.md §7 hard-part 4).
    """
    from ife_tpu.stats.equalize import edges_from_dense_counts

    counts = np.asarray(counts, dtype=np.float64)
    edges = np.asarray(edges, dtype=np.float64)
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if counts.size != edges.size + 1:
        raise ValueError(
            f"expected {edges.size + 1} counts for {edges.size} edges, "
            f"got {counts.size}"
        )
    if edges.size < 2:
        raise ValueError("need at least 2 edges to bound the tail bins")
    lo = edges[0] - (edges[1] - edges[0])
    hi = edges[-1] + (edges[-1] - edges[-2])
    bounds = np.concatenate([[lo], edges, [hi]])
    return edges_from_dense_counts(bounds, counts, n_bins)
