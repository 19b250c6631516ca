"""Pallas TPU histogram kernel: cumulative compare-accumulate binning.

The reference bins one voxel at a time with std::lower_bound
(DenseHistogram.h:47-53). The TPU-native form used here is the same
cumulative compare-reduce as stats.histogram.histogram_counts —
C[j] = sum_i w_i * (x_i <= e_j), counts = diff(C) — but as a single
Pallas pass: each grid step streams one (bx, 128) block of values (and
optionally mask weights) through VMEM, unrolls the E-edge compare loop
on the VPU with the edge values read from SMEM, and accumulates per-lane
partial counts in a persistent (E, 128) int32 scratch; the last step
writes the scratch out, and the wrapper reduces the 128 lanes in XLA.
One read of the data at streaming bandwidth, no scatter, bit-exact
searchsorted-left semantics (the XLA fallback's own fuzz suite runs this
kernel in interpreter mode against the same oracles).

The unrolled edge loop caps the per-PASS edge count at 128 (compile
size and VPU work are both O(E)), but the cumulative form makes edge
blocks INDEPENDENT — C[j] never depends on other edges — so arbitrary
edge counts run as ceil(E/128) passes over the data, each at streaming
bandwidth. Product histogram-spec sizes (~30 bins, MakeBag.cxx:334-371)
take one pass; the 4096-edge fine pre-histograms of the scalable
bin-edge pipeline take 33 (measured 1.76 s -> ~0.2 s per 512^3 channel
vs the XLA scan form).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hist_kernel(e_ref, v_ref, w_ref, o_ref, acc, *, E, n_steps, weighted):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    v = v_ref[:]                      # (bx, 128)
    if weighted:
        # full integer weights (not a 0/1 reduction): the XLA fallback
        # computes sum(w * (v <= e)), and the two dispatch paths must
        # agree for ANY nonnegative int weights
        w = w_ref[:]
    rows = []
    for j in range(E - 1):
        e = e_ref[j]                  # scalar from SMEM
        le = v <= e
        if weighted:
            rows.append(jnp.sum(jnp.where(le, w, 0), axis=0))
        else:
            rows.append(jnp.sum(le.astype(jnp.int32), axis=0))
    # the last row is the weighted TOTAL (not a compare): NaN values must
    # count into the unbounded tail bin, exactly like searchsorted-left
    if weighted:
        rows.append(jnp.sum(w, axis=0))
    else:
        rows.append(jnp.full((v.shape[1],), v.shape[0], jnp.int32))
    acc[:, :] = acc[:, :] + jnp.stack(rows, axis=0)

    @pl.when(i == n_steps - 1)
    def _():
        o_ref[:] = acc[:]


def _hist_multi_kernel(e_ref, w_ref, *refs, E, C, n_steps, weighted):
    """C channels binned per block: the weights stream is read ONCE for
    all channels (the single-channel form re-reads it per channel — at
    nine 512^3 channels that is 8 extra volume reads). e_ref: (C, E)
    SMEM — per-channel edge rows (row layout [edges..., unused-total
    slot]); acc/out: (C*E, 128) int32, channel-major."""
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


_HIST_BX = 2048  # rows per grid step; callers pad R to a multiple


@functools.partial(jax.jit, static_argnames=("interpret",))
def _hist_pallas(values2d, weights2d, edges_ext, interpret=False):
    """values2d/weights2d: (R, 128); edges_ext: (E,) f32 WITH the +inf
    total row appended and padded rows already zero-weighted. Returns
    (E, 128) int32 per-lane cumulative counts."""
    E = int(edges_ext.shape[0])
    R = values2d.shape[0]
    bx = min(R, _HIST_BX)
    if R % bx:
        raise ValueError(
            f"values rows ({R}) must be a multiple of the block ({bx}) — "
            "pad as histogram_counts_pallas does")
    n_steps = R // bx
    weighted = weights2d is not None
    kernel = functools.partial(
        _hist_kernel, E=E, n_steps=n_steps, weighted=weighted)
    blk = pl.BlockSpec((bx, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), blk]
    args = [edges_ext, values2d]
    if weighted:
        in_specs.append(blk)
        args.append(weights2d)
    else:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.zeros((1,), jnp.int32))  # unused placeholder
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((E, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((E, 128), jnp.int32)],
        interpret=interpret,
    )(*args)
    return out


def histogram_counts_pallas(values, edges, weights=None, interpret=False):
    """Reference-convention counts ((E,) edges -> (E+1,) int32) via the
    Pallas compare-accumulate kernel. Semantics identical to
    stats.histogram.histogram_counts; serves f32 values with any E
    (multiple passes over the data for E > 128 — cumulative counts make
    edge blocks independent).
    """
    v = values.reshape(-1).astype(jnp.float32)
    n = v.shape[0]
    E = int(edges.shape[0])
    lanes = 128
    block = _HIST_BX * lanes
    pad = (-n) % block
    if pad:
        v = jnp.pad(v, (0, pad), constant_values=np.inf)
    if weights is not None:
        w = weights.reshape(-1).astype(jnp.int32)
        if pad:
            w = jnp.pad(w, (0, pad))
    elif pad:
        # +inf pads must not count into the +inf total row -> need weights
        w = jnp.pad(jnp.ones((n,), jnp.int32), (0, pad))
    else:
        w = None
    R = v.shape[0] // lanes
    v2 = v.reshape(R, lanes)
    w2 = None if w is None else w.reshape(R, lanes)
    ef = edges.astype(jnp.float32)
    cums = []
    tot = None
    for lo in range(0, E, 128):
        blk = ef[lo : lo + 128]
        # the appended row is the weighted TOTAL (computed without a
        # compare); identical across blocks, kept from the first
        blk_ext = jnp.concatenate(
            [blk, jnp.asarray([np.inf], jnp.float32)])
        per_lane = _hist_pallas(v2, w2, blk_ext, interpret=interpret)
        s = per_lane.sum(axis=1)
        cums.append(s[:-1])
        if tot is None:
            tot = s[-1:]
    cum = jnp.concatenate(cums) if len(cums) > 1 else cums[0]
    first = cum[:1]
    interior = cum[1:E] - cum[:E - 1]
    tail = tot - cum[E - 1:E]
    return jnp.concatenate([first, interior, tail])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _hist_multi_pallas(values2d_list, weights2d, edges2d, interpret=False):
    """values2d_list: tuple of C (R, 128) arrays; edges2d: (C, E) f32
    with per-channel edges (the E-th slot per row is the unused total
    placeholder). Returns (C*E, 128) int32 channel-major cumulative
    counts."""
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
        raise ValueError("rows must be a multiple of the block")
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
        args.append(jnp.zeros((1,), jnp.int32))
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


def histogram_counts_multi(channels, edges, weights=None, interpret=False):
    """C channels binned in ONE streaming pass (the weights/mask stream
    is read once instead of per channel): channels is a sequence of C
    equally-sized f32 arrays, edges is (E,) shared or (C, E) per-channel,
    weights an optional shared int array. Returns (C, E+1) int32 counts,
    row c == histogram_counts(channels[c], edges[c], weights).
    Serves E <= 127 per call (the product's histogram-spec sizes)."""
    channels = [c.reshape(-1).astype(jnp.float32) for c in channels]
    C = len(channels)
    n = channels[0].shape[0]
    e = jnp.asarray(edges, jnp.float32)
    if e.ndim == 1:
        e = jnp.broadcast_to(e[None, :], (C, e.shape[0]))
    E = int(e.shape[1])
    if E > 127:
        raise ValueError("histogram_counts_multi serves E <= 127 edges")
    lanes = 128
    block = _HIST_BX * lanes
    pad = (-n) % block
    if pad:
        channels = [jnp.pad(v, (0, pad), constant_values=np.inf)
                    for v in channels]
    if weights is not None:
        w = weights.reshape(-1).astype(jnp.int32)
        if pad:
            w = jnp.pad(w, (0, pad))
    elif pad:
        w = jnp.pad(jnp.ones((n,), jnp.int32), (0, pad))
    else:
        w = None
    R = channels[0].shape[0] // lanes
    v2 = tuple(v.reshape(R, lanes) for v in channels)
    w2 = None if w is None else w.reshape(R, lanes)
    # one trailing slot per row for the total (value unused by the kernel)
    e_ext = jnp.concatenate(
        [e, jnp.full((C, 1), np.inf, jnp.float32)], axis=1)
    per_lane = _hist_multi_pallas(v2, w2, e_ext, interpret=interpret)
    cum = per_lane.sum(axis=1).reshape(C, E + 1)
    first = cum[:, :1]
    interior = cum[:, 1:E] - cum[:, :E - 1]
    tail = cum[:, E:] - cum[:, E - 1:E]
    return jnp.concatenate([first, interior, tail], axis=1)
