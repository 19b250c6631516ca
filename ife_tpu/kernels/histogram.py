"""Pallas TPU histogram kernel: cumulative compare-accumulate binning.

The reference bins one voxel at a time with std::lower_bound
(DenseHistogram.h:13-78). The TPU-native form used here is the same
cumulative compare-reduce as stats.histogram.histogram_counts —
C[j] = sum_i w_i * (x_i <= e_j), counts = diff(C) — but as a streaming
Pallas pass: each grid step moves one (bx, 128) block of every channel
(and the optional shared weights) through VMEM, unrolls the edge-compare
loop on the VPU with edge values read from SMEM, and accumulates
per-lane partial counts in a persistent int32 scratch; the last step
writes the scratch out and the wrapper reduces the 128 lanes in XLA.
One read of the data at streaming bandwidth, no scatter, bit-exact
searchsorted-left semantics (interpreter-mode tests run this kernel
against the searchsorted oracle, and bench.py --verify runs it on chip).

ONE kernel serves every shape of the problem:
  * C channels share the weights stream (read once — the per-channel
    form re-reads it C times), with shared or per-channel edge rows;
  * the unrolled edge loop caps the per-PASS edge count at 127, but the
    cumulative form makes edge blocks INDEPENDENT — C[j] never depends
    on other edges — so arbitrary edge counts run as ceil(E/127) passes
    over the data (the 4096-edge fine pre-histograms of the scalable
    bin-edge pipeline: 1.76 s with the XLA scan -> ~0.4 s here, 512^3);
  * the single-channel API is the C=1 case of the same kernel.

Known constraint (found on chip): the SMEM edges operand cannot be
BATCHED — vmapping these functions over the edges axis fails to lower;
use stats.histogram.histogram_counts_xla in vmap contexts (tiny inputs
like per-ROI crops belong there anyway).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIST_BX = 2048  # rows per grid step at C=1; scaled down with channels


def _hist_multi_kernel(e_ref, w_ref, *refs, E, C, n_steps, weighted):
    """C channels binned per block. e_ref: (C, E) SMEM — per-channel
    edge rows, slot E-1 being the unused total placeholder; acc/out:
    (C*E, 128) int32, channel-major. The last row of every channel is
    the weighted TOTAL (no compare): NaN values must count into the
    unbounded tail bin, exactly like searchsorted-left. Weights are full
    integers (sum, not a boolean reduction) so the XLA fallback and this
    kernel agree for any nonnegative int weights."""
    v_refs, o_ref, acc = refs[:-2], refs[-2], refs[-1]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    if weighted:
        w = w_ref[:]
    rows = []
    for c in range(C):
        v = v_refs[c][:]
        for j in range(E - 1):
            e = e_ref[c, j]
            le = v <= e
            if weighted:
                rows.append(jnp.sum(jnp.where(le, w, 0), axis=0))
            else:
                rows.append(jnp.sum(le.astype(jnp.int32), axis=0))
        if weighted:
            rows.append(jnp.sum(w, axis=0))
        else:
            rows.append(jnp.full((v.shape[1],), v.shape[0], jnp.int32))
    acc[:, :] = acc[:, :] + jnp.stack(rows, axis=0)

    @pl.when(i == n_steps - 1)
    def _():
        o_ref[:] = acc[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _hist_multi_pallas(values2d_list, weights2d, edges2d, interpret=False):
    """values2d_list: tuple of C (R, 128) arrays; edges2d: (C, E) f32
    (slot E-1 per row is the total placeholder). Returns (C*E, 128)
    int32 channel-major per-lane cumulative counts."""
    C = len(values2d_list)
    E = int(edges2d.shape[1])
    R = values2d_list[0].shape[0]
    # C+1 double-buffered (bx, 128) streams must fit the scoped-vmem
    # budget (C=9 at bx=2048 hit the 16 MB default limit on chip) —
    # shrink bx with the channel count (power of two, so it divides the
    # _HIST_BX-padded R)
    bx = _HIST_BX
    while bx > 256 and (C + 1) * bx * 128 * 4 * 2 > 12 * 1024 * 1024:
        bx //= 2
    bx = min(R, bx)
    if R % bx:
        raise ValueError(
            f"values rows ({R}) must be a multiple of the block ({bx}) — "
            "pad as the wrappers do")
    n_steps = R // bx
    weighted = weights2d is not None
    kernel = functools.partial(
        _hist_multi_kernel, E=E, C=C, n_steps=n_steps, weighted=weighted)
    blk = pl.BlockSpec((bx, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    args = [edges2d]
    if weighted:
        in_specs.append(blk)
        args.append(weights2d)
    else:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.zeros((1,), jnp.int32))  # unused placeholder
    in_specs += [blk] * C
    args += list(values2d_list)
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((C * E, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C * E, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((C * E, 128), jnp.int32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return out


def _edges_f32_round_down(edges):
    """Edges as f32 preserving the comparison convention: for f32 values,
    `v <= e` is invariant under casting e down to the largest f32 <= e
    (and WRONG if e rounds up: values in (e, f32(e)] would bin low). A
    no-op for edges that are already f32."""
    e = jnp.asarray(edges)
    if e.dtype == jnp.float32:
        return e
    e32 = e.astype(jnp.float32)
    over = e32.astype(e.dtype) > e
    return jnp.where(
        over, jnp.nextafter(e32, jnp.asarray(-np.inf, jnp.float32)), e32)


def _counts_from_blocks(v2, w2, e2, n_unweighted_pad, interpret):
    """(C, E+1) int32 counts from edge-block kernel passes. e2: (C, E)
    f32 true edges (no total slot). Handles any E via ceil(E/127)
    passes — cumulative counts make edge blocks independent."""
    C, E = int(e2.shape[0]), int(e2.shape[1])
    cums = []
    tot = None
    for lo in range(0, E, 127):
        blk = e2[:, lo : lo + 127]
        blk_ext = jnp.concatenate(
            [blk, jnp.full((C, 1), np.inf, jnp.float32)], axis=1)
        per_lane = _hist_multi_pallas(v2, w2, blk_ext, interpret=interpret)
        s = per_lane.sum(axis=1).reshape(C, -1)
        cums.append(s[:, :-1])
        if tot is None:
            # the total row is identical across blocks; kept once. With
            # unweighted +inf padding it over-counts the pads — subtract.
            tot = s[:, -1:] - n_unweighted_pad
    cum = jnp.concatenate(cums, axis=1) if len(cums) > 1 else cums[0]
    first = cum[:, :1]
    interior = cum[:, 1:E] - cum[:, :E - 1]
    tail = tot - cum[:, E - 1:E]
    return jnp.concatenate([first, interior, tail], axis=1)


def _prepare(channels, weights):
    """Pad/reshape channels to (R, 128) blocks; returns (v2 tuple, w2,
    n_unweighted_pad) with the +inf/zero-weight padding rules."""
    channels = [c.reshape(-1).astype(jnp.float32) for c in channels]
    n = channels[0].shape[0]
    lanes = 128
    block = _HIST_BX * lanes
    # zero-length input still runs one full block of +inf pads (weight 0 /
    # subtracted from the total): R=0 would make the block math divide by
    # zero instead of returning the zero counts the XLA path returns
    pad = (-n) % block if n else block
    if pad:
        channels = [jnp.pad(v, (0, pad), constant_values=np.inf)
                    for v in channels]
    n_unweighted_pad = 0
    if weights is not None:
        w = weights.reshape(-1).astype(jnp.int32)
        if pad:
            w = jnp.pad(w, (0, pad))
    else:
        w = None
        # unweighted + padded: the +inf pads fall past every edge (no
        # bin) but DO count into the total row — subtracted by the
        # caller via n_unweighted_pad
        n_unweighted_pad = pad
    R = channels[0].shape[0] // lanes
    v2 = tuple(v.reshape(R, lanes) for v in channels)
    w2 = None if w is None else w.reshape(R, lanes)
    return v2, w2, n_unweighted_pad


def histogram_counts_pallas(values, edges, weights=None, interpret=False):
    """Reference-convention counts ((E,) edges -> (E+1,) int32): the
    C=1 case of the multi-channel kernel. Semantics identical to
    stats.histogram.histogram_counts for f32 values; any E."""
    v2, w2, npad = _prepare([values], weights)
    e2 = _edges_f32_round_down(edges)[None, :]
    return _counts_from_blocks(v2, w2, e2, npad, interpret)[0]


def histogram_counts_multi(channels, edges, weights=None, interpret=False):
    """C channels binned in shared streaming passes (the weights/mask
    stream is read once instead of per channel): channels is a sequence
    of C equally-sized arrays, edges is (E,) shared or (C, E)
    per-channel, weights an optional shared nonnegative-int array.
    Returns (C, E+1) int32 counts, row c ==
    histogram_counts(channels[c], edges[c], weights) for f32 channels
    (f64 inputs are compared in f32 with edges rounded DOWN — the exact
    f32-value/f64-edge convention; see _edges_f32_round_down). Any E
    (ceil(E/127) passes)."""
    channels = list(channels)
    C = len(channels)
    e = _edges_f32_round_down(edges)
    if e.ndim == 1:
        e = jnp.broadcast_to(e[None, :], (C, e.shape[0]))
    v2, w2, npad = _prepare(channels, weights)
    return _counts_from_blocks(v2, w2, e, npad, interpret)
