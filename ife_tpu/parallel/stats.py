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
    replicated. Returns replicated (E+1,) counts == the single-device
    histogram of values[mask != 0].
    """
    pspec = volume_pspec(mesh)

    def block(v, m, e):
        w = (m != 0).astype(jnp.float32)
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
    """Approximate equal-frequency edges from dense pre-histogram counts.

    The scalable replacement for the exact global sort (documented
    approximation switch, SURVEY.md §7 hard-part 4): linearly interpolates
    the empirical CDF of the pre-histogram at the n_bins-1 interior
    quantiles. Accuracy is set by the pre-histogram resolution.
    """
    counts = np.asarray(counts, dtype=np.float64)
    edges = np.asarray(edges, dtype=np.float64)
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    total = counts.sum()
    if total <= 0:
        raise ValueError("empty histogram")
    # interior bins only: tail bins are unbounded; clamp their mass to the
    # nearest finite edge
    cdf = np.concatenate([[0.0], np.cumsum(counts)]) / total
    # positions of bin boundaries on the value axis: edges[i] closes bin i
    # (-inf, e0](e0, e1]... -> boundary value for cdf index i is edges[i-1]
    targets = np.arange(1, n_bins) / n_bins
    out = np.empty(n_bins - 1)
    for j, t in enumerate(targets):
        k = int(np.searchsorted(cdf, t, side="left"))  # cdf[k-1] < t <= cdf[k]
        k = min(max(k, 1), counts.size)
        lo_v = edges[k - 2] if k >= 2 else edges[0] - (edges[1] - edges[0])
        hi_v = edges[k - 1] if k - 1 < edges.size else edges[-1] + (edges[-1] - edges[-2])
        c0, c1 = cdf[k - 1], cdf[k]
        frac = 0.0 if c1 == c0 else (t - c0) / (c1 - c0)
        out[j] = lo_v + frac * (hi_v - lo_v)
    return out
