"""Dense histograms with fixed edges.

Reference semantics (include/ife/Statistics/DenseHistogram.h:13-78):
n sorted edges define n+1 bins
    (-inf, e0], (e0, e1], ..., (e_{n-1}, +inf)
i.e. bin(x) = index of first edge >= x  ==  searchsorted(edges, x, 'left').
Frequencies are counts / total.

TPU-first design: instead of ITK's one-voxel-at-a-time std::lower_bound
insert loop (DenseHistogram.h:47-53, the MakeBag hot loop at
tools/MakeBag.cxx:448-457), binning is a vectorized searchsorted plus a
scatter-add over the whole sample block, jittable and psum-reducible across
shards (SURVEY.md §2.4: collective reductions for statistics).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


def histogram_counts(
    values: jnp.ndarray,
    edges: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Counts over n+1 bins for n edges, reference bin convention.

    Accumulates in int32: a float32 accumulator silently drops +1
    increments past 2^24 ≈ 16.7M counts per bin — a real failure mode at
    production volume sizes (a 512³ dense masked histogram has 1.3e8
    voxels). int32 is exact to 2.1e9 per bin and psum-reduces across
    shards natively (semantics anchor: integer counts in reference
    DenseHistogram.h:47-53).

    Args:
      values: any shape; flattened.
      edges: (E,) sorted ascending.
      weights: optional same shape as values — a 0/1 mask (cast to int32;
        fractional weights are not supported).

    Returns:
      (E+1,) int32 counts.
    """
    v = values.reshape(-1)
    if weights is None:
        w = jnp.ones_like(v, dtype=jnp.int32)
    else:
        w = weights.reshape(-1).astype(jnp.int32)
    # Large inputs go through a lax.scan over fixed-size chunks: one
    # whole-volume scatter materializes the full index array plus the
    # scatter lowering's sort temporaries at once — at 512^3 alongside a
    # feature pass that contributed to TPU-worker OOM crashes (bench
    # config 4). The chunked form bounds the temporaries to one chunk and
    # is bit-identical (int32 adds commute).
    chunk = 1 << 22
    if v.shape[0] > chunk:
        pad = (-v.shape[0]) % chunk
        # pad weights with 0: padded lanes never count
        vc = jnp.pad(v, (0, pad)).reshape(-1, chunk)
        wc = jnp.pad(w, (0, pad)).reshape(-1, chunk)

        def body(acc, args):
            vv, ww = args
            idx = jnp.searchsorted(edges, vv, side="left")
            return acc.at[idx].add(ww), None

        acc0 = jnp.zeros(edges.shape[0] + 1, jnp.int32)
        out, _ = jax.lax.scan(body, acc0, (vc, wc))
        return out
    idx = jnp.searchsorted(edges, v, side="left")
    return jnp.zeros(edges.shape[0] + 1, jnp.int32).at[idx].add(w)


def batched_histogram_counts(
    values: jnp.ndarray, edges: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Many histograms at once: values (H, N), edges (H, E) -> (H, E+1)."""
    fn = jax.vmap(histogram_counts, in_axes=(0, 0, None if weights is None else 0))
    return fn(values, edges, weights)


class DenseHistogram:
    """Host-side accumulating histogram mirroring the reference class API
    (insert / get_counts / get_frequencies / reset_counts), but with
    vectorized bulk inserts.

    Reference: DenseHistogram.h:13-78. getFrequencies divides by the total
    count (an integer sum, DenseHistogram.h:55-60).
    """

    def __init__(self, edges: Sequence[float]):
        e = np.asarray(list(edges), dtype=np.float64)
        if e.size < 1:
            raise ValueError("DenseHistogram needs at least one edge")
        self._edges = e
        self._counts = np.zeros(e.size + 1, dtype=np.uint64)

    @property
    def edges(self) -> np.ndarray:
        return self._edges

    @property
    def num_bins(self) -> int:
        return self._counts.size

    def insert(self, value) -> None:
        self.insert_many(np.atleast_1d(np.asarray(value)))

    def insert_many(self, values, weights=None) -> None:
        """Vectorized bulk insert (weights must be nonneg ints if given)."""
        v = np.asarray(values).reshape(-1)
        # f32 only: the C path bins float32, which could land f64 values in
        # a neighbor bin right at an edge
        if weights is None and v.size > (1 << 16) and v.dtype == np.float32:
            # threaded C++ binning when built (ife_tpu/native_lib.py)
            from ife_tpu.native_lib import histogram_native

            counts = histogram_native(v, self._edges)
            if counts is not None:
                self._counts += counts
                return
        idx = np.searchsorted(self._edges, v, side="left")
        if weights is None:
            binc = np.bincount(idx, minlength=self._counts.size)
        else:
            binc = np.bincount(
                idx, weights=np.asarray(weights).reshape(-1), minlength=self._counts.size
            )
        self._counts += binc.astype(np.uint64)

    def get_counts(self) -> np.ndarray:
        return self._counts.copy()

    def get_frequencies(self) -> np.ndarray:
        total = self._counts.sum()
        if total == 0:
            # reference divides by zero -> nan/inf; we keep 0/0 IEEE semantics
            with np.errstate(divide="ignore", invalid="ignore"):
                return self._counts / np.float64(total)
        return self._counts / np.float64(total)

    def reset_counts(self) -> None:
        self._counts[:] = 0

    def __str__(self) -> str:
        # reference operator<< writes comma-separated counts (DenseHistogram.h:80-84)
        return ",".join(str(int(c)) for c in self._counts)
