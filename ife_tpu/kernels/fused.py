"""Fused Hessian + symmetric-3x3 eigen-feature Pallas kernel.

Replaces the XLA-composed chain (ife_tpu.ops.stencil.hessian ->
ife_tpu.ops.eigen.eigenvalue_features) for the hot path: instead of
materializing dx, dy and the 6 Hessian channels in HBM (~6 extra
volume-sized round trips), each grid step DMAs one halo-extended (BX+2,
BY+2, Z) slab into VMEM, computes all six second derivatives (central
differences, cascaded cross terms — semantics of reference
Hessian3DImageFilter.hxx:19-59) and the closed-form eigenvalues (reference
Symmetric3x3EigenvalueSolver.h:33-132; trig-free polynomial path since
Mosaic has no acos — see ops/eigen.py) on the VPU, and writes the 6
feature channels. HBM
traffic = read X*Y*Z + write 6*X*Y*Z — the memory-bound lower bound.

Mosaic constraints shaping the design (found by bisection): no 4D blocks
with a stacked channel axis, no jnp.stack/moveaxis across the lane axis
inside the kernel — so features are SIX separate (X, Y, Z) outputs, written
channel-wise. The public wrapper stacks them into the channel-last (…, 6)
layout only when asked.
"""
from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ife_tpu.ops.eigen import eigenvalue_feature_channels


def _clamp_shift_z(s: jnp.ndarray, off: int) -> jnp.ndarray:
    """s shifted by `off` along the last (lane) axis with edge clamp."""
    if off == -1:
        return jnp.concatenate([s[..., :1], s[..., :-1]], axis=-1)
    if off == 1:
        return jnp.concatenate([s[..., 1:], s[..., -1:]], axis=-1)
    raise ValueError(off)


def _clamp_shift_z_roll(s: jnp.ndarray, off: int) -> jnp.ndarray:
    """Edge-clamped lane shift via pltpu.roll (a single lane rotate)
    instead of the slice+concat pair: concat across the lane axis lowers
    to two relayout copies, roll to one. The wrapped-around boundary lane
    is patched with a lane-index select (cheap VPU op)."""
    Z = s.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
    rolled = pltpu.roll(s, (-off) % Z, axis=s.ndim - 1)
    edge = Z - 1 if off == 1 else 0
    return jnp.where(lane == edge, s, rolled)


def _taps_z_roll(a: jnp.ndarray, taps, dt) -> jnp.ndarray:
    """Edge-clamped z (lane-axis) FIR via per-tap pltpu.roll.

    MEASURED NEGATIVE RESULT (round 4, r4_probe14): the hypothesis was
    that the chained-shift form (up = shift(up, 1) per tap — one or two
    lane relayouts per tap in a serial dependency chain) dominated
    large-radius sweeps, and that independent per-tap rotates (ILP across
    taps, one relayout each, clamp = two reusable lane-broadcasts + a
    lane-index select) would be faster. On chip the sweep pass timed the
    SAME (config 3: 3.94 vs 3.99 Gvox/s; sigma<=1.2 at 512^3 within 2%),
    and the independent rolls' simultaneous liveness added ~8 MB of
    Mosaic scoped-vmem stack — enough to push the sigma=2.4 512^3 sweep
    over the 112 MB limit (compile OOM). The sweep kernels therefore keep
    the chained form; this helper stays for the record and for probes.
    Semantics: identical clamp composition s[min(max(z+k,0),Z-1)]."""
    rz = (len(taps) - 1) // 2
    Z = a.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    lo = jnp.broadcast_to(a[..., :1], a.shape)
    hi = jnp.broadcast_to(a[..., -1:], a.shape)
    acc = jnp.asarray(taps[rz], dt) * a
    for k in range(1, rz + 1):
        up = jnp.where(lane >= Z - k, hi, pltpu.roll(a, (-k) % Z,
                                                     axis=a.ndim - 1))
        dn = jnp.where(lane < k, lo, pltpu.roll(a, k % Z, axis=a.ndim - 1))
        acc = acc + jnp.asarray(taps[rz + k], dt) * up
        acc = acc + jnp.asarray(taps[rz - k], dt) * dn
    return acc


def _window_pipeline(x_hbm, scratch, sem, bx, by, wy, n_buf, ex=None):
    """Fetch this grid step's halo window into VMEM. n_buf=2: prefetch the
    next step's window into the other slot so HBM reads overlap compute
    (scratch persists across TPU grid steps); n_buf=1: plain fetch (used
    when VMEM is too tight for two slots — output pipeline buffers already
    claim most of the 16MB).

    DMA window: (ex, wy, Z) — ex defaults to bx+2 (radius-1 stencil halo);
    the xs kernel passes the smoothing-extended extent. wy is the
    y window extent rounded up to the f32 sublane multiple (8) — an
    unaligned sublane extent in a manual DMA faults the TPU worker (found
    the hard way); the input is pre-padded so the widened window never
    reads out of bounds.
    """
    if ex is None:
        ex = bx + 2
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_i = pl.num_programs(0)
    n_j = pl.num_programs(1)
    step = i * n_j + j

    def window_dma(s, slot):
        wi = s // n_j
        wj = s % n_j
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(wi * bx, ex), pl.ds(wj * by, wy), :],
            scratch.at[slot],
            sem.at[slot],
        )

    if n_buf == 1:
        dma = window_dma(step, 0)
        dma.start()
        dma.wait()
        return scratch[0]

    @pl.when(step == 0)
    def _():
        window_dma(step, 0).start()

    @pl.when(step + 1 < n_i * n_j)
    def _():
        window_dma(step + 1, (step + 1) % 2).start()

    window_dma(step, step % 2).wait()
    return scratch[step % 2]


def _two_windows(n_hbm, c_hbm, n_s, c_s, sem_n, sem_c, bx, by, wy, ex,
                 n_buf):
    """Fetch BOTH halo windows of the current grid step with their DMAs in
    flight together. n_buf=2 keeps the cross-step prefetch pipeline of
    _window_pipeline; n_buf=1 issues both starts before either wait (the
    naive per-window fetch serializes two multi-MB copies per step)."""
    if n_buf == 2:
        return (_window_pipeline(n_hbm, n_s, sem_n, bx, by, wy, 2, ex=ex),
                _window_pipeline(c_hbm, c_s, sem_c, bx, by, wy, 2, ex=ex))
    i = pl.program_id(0)
    j = pl.program_id(1)

    def dma(h, s, sem):
        return pltpu.make_async_copy(
            h.at[pl.ds(i * bx, ex), pl.ds(j * by, wy), :], s.at[0],
            sem.at[0],
        )

    d1 = dma(n_hbm, n_s, sem_n)
    d2 = dma(c_hbm, c_s, sem_c)
    d1.start()
    d2.start()
    d1.wait()
    d2.wait()
    return n_s[0], c_s[0]


def _stencil_block(s, hx, hy, hz, zshift="concat"):
    """All central-difference derivatives of the halo window s
    (bx+2, by+2, Z). Multiply-by-reciprocal (constants folded in f64 at
    trace time, exactly like ops.stencil.derivative) — VPU divides run at
    a fraction of mul throughput and this kernel is VPU-bound.

    Returns (core, dxx, dyy, dzz, dxy, dxz, dyz, dx_c, dy, dz_c), each
    (bx, by, Z).
    """
    dt = s.dtype
    r2x = jnp.asarray(1.0 / (2.0 * hx), dt)
    r2y = jnp.asarray(1.0 / (2.0 * hy), dt)
    r2z = jnp.asarray(1.0 / (2.0 * hz), dt)
    rxx = jnp.asarray(1.0 / (hx * hx), dt)
    ryy = jnp.asarray(1.0 / (hy * hy), dt)
    rzz = jnp.asarray(1.0 / (hz * hz), dt)

    core = s[1:-1, 1:-1, :]
    dxx = (s[2:, 1:-1, :] - 2 * core + s[:-2, 1:-1, :]) * rxx
    dyy = (s[1:-1, 2:, :] - 2 * core + s[1:-1, :-2, :]) * ryy

    # ONE pair of window-wide lane shifts serves dzz, dxz, dyz (and the
    # gradient's z component): lane relayouts are the expensive vector ops
    # here, and mixed central differences with clamped boundaries commute
    # exactly (same clamped index set as the reference's cascade order;
    # only f32 association differs, at the ulp level).
    shift = _clamp_shift_z_roll if zshift == "roll" else _clamp_shift_z
    s_p = shift(s, 1)
    s_m = shift(s, -1)
    dz_w = (s_p - s_m) * r2z                          # (bx+2, by+2, Z)
    dzz = (
        s_p[1:-1, 1:-1, :] - 2 * core + s_m[1:-1, 1:-1, :]
    ) * rzz
    dxz = (dz_w[2:, 1:-1, :] - dz_w[:-2, 1:-1, :]) * r2x
    dyz = (dz_w[1:-1, 2:, :] - dz_w[1:-1, :-2, :]) * r2y

    # cascaded cross derivative (two radius-1 passes, like the reference)
    dx = (s[2:, :, :] - s[:-2, :, :]) * r2x          # (bx, by+2, Z)
    dxy = (dx[:, 2:, :] - dx[:, :-2, :]) * r2y       # (bx, by, Z)
    dx_c = dx[:, 1:-1, :]
    dy = (s[1:-1, 2:, :] - s[1:-1, :-2, :]) * r2y    # (bx, by, Z)
    dz_c = dz_w[1:-1, 1:-1, :]
    return core, dxx, dyy, dzz, dxy, dxz, dyz, dx_c, dy, dz_c


def _clamp_shift_y(s: jnp.ndarray, off: int) -> jnp.ndarray:
    """s shifted by `off` along the sublane (y) axis with edge clamp."""
    if off == -1:
        return jnp.concatenate([s[:, :1, :], s[:, :-1, :]], axis=1)
    if off == 1:
        return jnp.concatenate([s[:, 1:, :], s[:, -1:, :]], axis=1)
    raise ValueError(off)


def _emit_features8(o_refs, inside, s0, sm, sp, yshift, hx, hy, hz,
                    zshift=_clamp_shift_z):
    """The shared features8 tail: gradient magnitude, 6-channel Hessian
    (cascaded cross terms), eigen features, masking — written to the 8
    output refs. ONE copy for every streaming kernel (sweep, sweep
    multi, xs stream, ys multi): the round-5 true-face clamp bugs
    existed precisely because this chain was copy-pasted per kernel and
    the copies drifted. Callers provide the x-stencil rows (sm, s0, sp
    — with their own phantom-clamp policy already applied), the y-shift
    function (plain edge clamp, or the dynamic true-face variant for
    halo-extended shard blocks), and a z-shift: kernels whose inputs
    are smoothed IN-KERNEL from a z-edge-padded raw volume must pass
    the true-face z variant (padded z planes hold
    smoothing-at-virtual-position, not the clamp value — z is never
    sharded, so the true face is static); kernels whose inputs are
    padded AFTER smoothing keep the plain clamp (replicas are exact).
    Semantics: reference Hessian3DImageFilter.hxx:19-59 +
    ImageToEmphysemaFeaturesFilter.hxx:14-55."""
    dt = s0.dtype
    r2x = jnp.asarray(1.0 / (2.0 * hx), dt)
    r2y = jnp.asarray(1.0 / (2.0 * hy), dt)
    r2z = jnp.asarray(1.0 / (2.0 * hz), dt)
    rxx = jnp.asarray(1.0 / (hx * hx), dt)
    ryy = jnp.asarray(1.0 / (hy * hy), dt)
    rzz = jnp.asarray(1.0 / (hz * hz), dt)

    dxx = (sp - 2 * s0 + sm) * rxx
    s_yp = yshift(s0, 1)
    s_ym = yshift(s0, -1)
    dyy = (s_yp - 2 * s0 + s_ym) * ryy
    s_zp = zshift(s0, 1)
    s_zm = zshift(s0, -1)
    dzz = (s_zp - 2 * s0 + s_zm) * rzz
    dx = (sp - sm) * r2x
    dxy = (yshift(dx, 1) - yshift(dx, -1)) * r2y
    dxz = (zshift(dx, 1) - zshift(dx, -1)) * r2z
    dy = (s_yp - s_ym) * r2y
    dyz = (zshift(dy, 1) - zshift(dy, -1)) * r2z
    dz = (s_zp - s_zm) * r2z
    gm = jnp.sqrt(dx * dx + dy * dy + dz * dz)

    feats = eigenvalue_feature_channels(
        dxx, dxy, dxz, dyy, dyz, dzz, use_trig=False, diag_path=False
    )
    zero = jnp.asarray(0, dt)
    o_refs[0][:] = jnp.where(inside, s0, zero)
    o_refs[1][:] = jnp.where(inside, gm, zero)
    for ref, val in zip(o_refs[2:8], feats):
        ref[:] = jnp.where(inside, val, zero)


def _true_face_yshift(y_lo, y_hi, col):
    """y shift whose phantom clamps at DYNAMIC true-face columns (the
    halo-extended shard case — see _features8_sweep_kernel docstring)."""
    def yshift(a, off):
        raw = _clamp_shift_y(a, off)
        if off == 1:
            return jnp.where(col >= y_hi, a, raw)
        return jnp.where(col <= y_lo, a, raw)

    return yshift


def _true_face_zshift(z_hi):
    """z shift whose phantom clamps at the STATIC true-face lane z_hi
    (z is never sharded; lanes beyond z_hi are alignment padding whose
    in-kernel-smoothed values are NOT the clamp — review-confirmed up
    to ~117% derivative error on the last true z plane when
    Z % 128 != 0 before this existed). z_hi = Z-1 (no padding) reduces
    to the plain clamp."""
    def zshift(a, off):
        raw = _clamp_shift_z(a, off)
        lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
        if off == 1:
            return jnp.where(lane >= z_hi, a, raw)
        return raw  # the low z face is lane 0: the plain clamp is exact

    return zshift


def _stream_kernel(x_ref, *refs, bx, hx, hy, hz, n_x, ext_halo=False):
    """Streaming Hessian+eig: 1D grid over x-slabs, NO manual halo DMA.

    The x stencil halo is carried ACROSS grid steps instead of re-fetched
    per window: step i receives input block i via the auto-pipelined
    BlockSpec (min(i, n_x-1) — the last block is re-read once), computes
    the full stencil/eigen chain for block i-1 from the persistent VMEM
    scratches (prev = block i-1, prev_last = the last row of block i-2),
    and writes output block max(i-1, 0) — a LAGGED output index map, so
    step 0's garbage write to block 0 is overwritten by step 1 while the
    block is still resident. y and z are full-extent in the block, so
    their boundaries are true volume edges handled by clamp shifts.

    vs the windowed kernel this removes the (bx+2)/bx input read
    amplification AND the manual-DMA scheduling overhead (measured ~2.3 ms
    of the 9.5 ms pass at 512^3): every byte moves through Mosaic's own
    block pipeline. Semantics identical: reference
    Hessian3DImageFilter.hxx:19-59 + Symmetric3x3EigenvalueSolver.h:33-132.

    ext_halo=True: two extra (1, Y, Z) inputs carry the volume's x-halo
    ROWS (e.g. ppermuted neighbor rows of a 1D-sharded block): the low
    edge seeds prev_last from the lo row instead of the clamp replica,
    and the final step's high x-layer reads the hi row — so a sharded
    block computes its true interior derivatives WITHOUT materializing a
    halo-extended copy of the whole block (~3 ms of pure copy at 512^3).
    """
    if ext_halo:
        lh_ref, rh_ref = refs[0], refs[1]
        refs = refs[2:]
    o0, o1, o2, o3, o4, o5, prev, prev_last = refs
    i = pl.program_id(0)
    dt = x_ref.dtype
    r2x = jnp.asarray(1.0 / (2.0 * hx), dt)
    r2y = jnp.asarray(1.0 / (2.0 * hy), dt)
    r2z = jnp.asarray(1.0 / (2.0 * hz), dt)
    rxx = jnp.asarray(1.0 / (hx * hx), dt)
    ryy = jnp.asarray(1.0 / (hy * hy), dt)
    rzz = jnp.asarray(1.0 / (hz * hz), dt)

    cur = x_ref[:]

    @pl.when(i > 0)
    def _():
        s0 = prev[:]
        # x layers for output rows r: global (i-1)*bx + r - 1 / + 1.
        # prev_last holds the clamped row -1 at the volume's low edge
        # (step 0 seeds it with block 0's first row — or the lo halo
        # row); the high edge clamps to prev's own last row (or the hi
        # halo row) on the final (re-read) step.
        sm = jnp.concatenate([prev_last[:], s0[:-1]], axis=0)
        hi_row = rh_ref[:] if ext_halo else s0[-1:]
        hi = jnp.where(i == n_x, hi_row, cur[:1])
        sp = jnp.concatenate([s0[1:], hi], axis=0)

        core = s0
        dxx = (sp - 2 * core + sm) * rxx
        s_yp = _clamp_shift_y(s0, 1)
        s_ym = _clamp_shift_y(s0, -1)
        dyy = (s_yp - 2 * core + s_ym) * ryy
        s_zp = _clamp_shift_z(s0, 1)
        s_zm = _clamp_shift_z(s0, -1)
        dzz = (s_zp - 2 * core + s_zm) * rzz
        # cascaded cross terms (reference order: Dx->Dy, Dx->Dz, Dy->Dz;
        # clamped central differences commute stage-wise)
        dx = (sp - sm) * r2x
        dxy = (_clamp_shift_y(dx, 1) - _clamp_shift_y(dx, -1)) * r2y
        dxz = (_clamp_shift_z(dx, 1) - _clamp_shift_z(dx, -1)) * r2z
        dy = (s_yp - s_ym) * r2y
        dyz = (_clamp_shift_z(dy, 1) - _clamp_shift_z(dy, -1)) * r2z

        feats = eigenvalue_feature_channels(
            dxx, dxy, dxz, dyy, dyz, dzz, use_trig=False, diag_path=False
        )
        for ref, val in zip((o0, o1, o2, o3, o4, o5), feats):
            ref[:] = val

    @pl.when(i == 0)
    def _():
        # seed: row -1 := row 0 (ZeroFluxNeumann at the low x face) or
        # the lo halo row; the lagged output block 0 is written with
        # zeros and overwritten at step 1 while still resident
        prev_last[:] = lh_ref[:] if ext_halo else cur[:1]
        zero = jnp.zeros_like(cur)
        for ref in (o0, o1, o2, o3, o4, o5):
            ref[:] = zero

    @pl.when(i > 0)
    def _():
        prev_last[:] = prev[-1:]

    prev[:] = cur


def _features8_post_stream_kernel(s_ref, m_ref, *refs, bx, hx, hy,
                                  hz, n_x, ext_halo=False):
    """Streaming post-smoothing features8: the _stream_kernel structure
    (1D grid over x-slabs, carried x halo in persistent VMEM, lagged
    output map) extended with the gradient-magnitude/smoothed channels and
    the mask stage — smoothed volume + mask in, the 8 masked channels of
    reference ImageToEmphysemaFeaturesFilter.hxx:14-55 out. vs the
    windowed _features8_kernel this removes the manual halo-window DMA and
    its read amplification (the same win the stream Hessian kernel
    measured: 9.07 vs 9.54 ms at 512^3).

    The mask block rides the OUTPUT index map (block i-1): it is consumed
    only when the features of block i-1 are emitted.

    ext_halo: as in _stream_kernel — two (1, Y, Z) x-halo ROW inputs
    replace the edge clamps at the x faces (the zero-copy sharded path).
    """
    if ext_halo:
        lh_ref, rh_ref = refs[0], refs[1]
        refs = refs[2:]
    o0, o1, o2, o3, o4, o5, o6, o7, prev, prev_last = refs
    i = pl.program_id(0)
    dt = s_ref.dtype
    r2x = jnp.asarray(1.0 / (2.0 * hx), dt)
    r2y = jnp.asarray(1.0 / (2.0 * hy), dt)
    r2z = jnp.asarray(1.0 / (2.0 * hz), dt)
    rxx = jnp.asarray(1.0 / (hx * hx), dt)
    ryy = jnp.asarray(1.0 / (hy * hy), dt)
    rzz = jnp.asarray(1.0 / (hz * hz), dt)

    cur = s_ref[:]

    @pl.when(i > 0)
    def _():
        s0 = prev[:]
        sm = jnp.concatenate([prev_last[:], s0[:-1]], axis=0)
        hi_row = rh_ref[:] if ext_halo else s0[-1:]
        hi = jnp.where(i == n_x, hi_row, cur[:1])
        sp = jnp.concatenate([s0[1:], hi], axis=0)

        dxx = (sp - 2 * s0 + sm) * rxx
        s_yp = _clamp_shift_y(s0, 1)
        s_ym = _clamp_shift_y(s0, -1)
        dyy = (s_yp - 2 * s0 + s_ym) * ryy
        s_zp = _clamp_shift_z(s0, 1)
        s_zm = _clamp_shift_z(s0, -1)
        dzz = (s_zp - 2 * s0 + s_zm) * rzz
        dx = (sp - sm) * r2x
        dxy = (_clamp_shift_y(dx, 1) - _clamp_shift_y(dx, -1)) * r2y
        dxz = (_clamp_shift_z(dx, 1) - _clamp_shift_z(dx, -1)) * r2z
        dy = (s_yp - s_ym) * r2y
        dyz = (_clamp_shift_z(dy, 1) - _clamp_shift_z(dy, -1)) * r2z
        dz = (s_zp - s_zm) * r2z
        gm = jnp.sqrt(dx * dx + dy * dy + dz * dz)

        feats = eigenvalue_feature_channels(
            dxx, dxy, dxz, dyy, dyz, dzz, use_trig=False, diag_path=False
        )
        inside = m_ref[:] != 0
        zero = jnp.asarray(0, dt)
        o0[:] = jnp.where(inside, s0, zero)
        o1[:] = jnp.where(inside, gm, zero)
        for ref, val in zip((o2, o3, o4, o5, o6, o7), feats):
            ref[:] = jnp.where(inside, val, zero)

    @pl.when(i == 0)
    def _():
        prev_last[:] = lh_ref[:] if ext_halo else cur[:1]
        zero = jnp.zeros_like(cur)
        for ref in (o0, o1, o2, o3, o4, o5, o6, o7):
            ref[:] = zero

    @pl.when(i > 0)
    def _():
        prev_last[:] = prev[-1:]

    prev[:] = cur


def _kernel(x_hbm, o0, o1, o2, o3, o4, o5, scratch, sem, *, bx, by, wy,
            hx, hy, hz, n_buf, variant="concat"):
    win = _window_pipeline(x_hbm, scratch, sem, bx, by, wy, n_buf)
    s = win[:, : by + 2, :]  # (bx+2, by+2, Z)
    if variant == "copyfloor":
        # roofline probe: same HBM traffic (read window + write 6 blocks),
        # near-zero compute — measures the DMA floor of this kernel shape
        core = s[1:-1, 1:-1, :]
        for k, ref in enumerate((o0, o1, o2, o3, o4, o5)):
            ref[:] = core + jnp.asarray(float(k), s.dtype)
        return
    _, dxx, dyy, dzz, dxy, dxz, dyz, _, _, _ = _stencil_block(
        s, hx, hy, hz, zshift=variant
    )

    # channel order [Dxx, Dxy, Dxz, Dyy, Dyz, Dzz] == packed [A11..A33];
    # use_trig=False: polynomial path (no acos in Mosaic); diag_path=False:
    # scalar-matrix guard only (select network is measurable VPU time)
    feats = eigenvalue_feature_channels(
        dxx, dxy, dxz, dyy, dyz, dzz, use_trig=False, diag_path=False
    )
    for ref, val in zip((o0, o1, o2, o3, o4, o5), feats):
        ref[:] = val


def _features8_kernel(s_hbm, m_ref, o0, o1, o2, o3, o4, o5, o6, o7,
                      scratch, sem, *, bx, by, wy, hx, hy, hz, n_buf):
    """Post-smoothing features8 pass: smoothed volume (halo window) + mask
    block -> the 8 masked feature channels of reference
    ImageToEmphysemaFeaturesFilter.hxx:14-55, one VMEM round trip."""
    win = _window_pipeline(s_hbm, scratch, sem, bx, by, wy, n_buf)
    s = win[:, : by + 2, :]
    dt = s.dtype
    core, dxx, dyy, dzz, dxy, dxz, dyz, dx_c, dy, dz_c = _stencil_block(
        s, hx, hy, hz
    )
    gm = jnp.sqrt(dx_c * dx_c + dy * dy + dz_c * dz_c)

    feats = eigenvalue_feature_channels(
        dxx, dxy, dxz, dyy, dyz, dzz, use_trig=False, diag_path=False
    )
    inside = m_ref[:] != 0
    zero = jnp.asarray(0, dt)
    # channel order: GaussianBlur, GradientMagnitude, eig features
    # (tools/DetermineHistogramBinEdges...cxx:270); masked like the 8
    # MaskImageFilters (ImageToEmphysemaFeaturesFilter.hxx:44-54); the
    # nan/inf of the no-epsilon normalized-convolution divide lives only
    # outside the mask and is zeroed here
    o0[:] = jnp.where(inside, core, zero)
    o1[:] = jnp.where(inside, gm, zero)
    for ref, val in zip((o2, o3, o4, o5, o6, o7), feats):
        ref[:] = jnp.where(inside, val, zero)


def _features8_xs_kernel(n_hbm, c_hbm, m_ref, o0, o1, o2, o3, o4, o5, o6,
                         o7, n_s, c_s, s_src, s_dst, sem_n, sem_c, sem_s,
                         *, bx, by, wy, nxw, x_true, taps_x, hx, hy, hz,
                         n_buf, zshift):
    """features8 with the x-axis smoothing + normalized-convolution divide
    folded into the post-smoothing pass: inputs are the y/z-smoothed
    numerator (image*mask) and denominator (mask) volumes; this kernel
    finishes the separable smoothing along x (leading-axis tap FMAs — pure
    VPU, zero relayouts), divides (no epsilon — reference
    NormalizedGaussianConvolutionImageFilter.hxx:57-58), and runs the
    gradient/Hessian/eigen/masking chain of _features8_kernel on the
    result. Saves the smoothed volume's HBM round trip plus the two
    x-axis MXU passes of the staged path.

    x_true: the true (unpadded) X extent. The derivative stencils need
    ZeroFluxNeumann on the SMOOTHED image (s(-1) := s(0), s(X) := s(X-1)
    — exactly what itk::DerivativeImageFilter's boundary does on the
    smoothed input, Hessian3DImageFilter.hxx:19-59). The y/z halos get
    this from the host-side edge pad of the y/z-smoothed inputs (x-pass
    is per-column, so padded columns stay exact replicas), but the x halo
    rows are PRODUCED here, so they are re-clamped in-kernel by global
    row index."""
    nwin, cwin = _two_windows(n_hbm, c_hbm, n_s, c_s, sem_n, sem_c, bx, by,
                              wy, nxw, n_buf)
    dt = nwin.dtype
    nx1 = bx + 2

    def xpass(a):
        acc = jnp.asarray(taps_x[0], dt) * a[0:nx1]
        for t in range(1, len(taps_x)):
            acc = acc + jnp.asarray(taps_x[t], dt) * a[t:t + nx1]
        return acc

    sval = xpass(nwin) / xpass(cwin)  # (nx1, wy, Z)

    # true-edge clamp of the smoothed x-halo rows (see docstring). Window
    # row r is global row i*bx - 1 + r; rows outside [0, x_true-1] copy
    # their inward neighbor. Two leading-axis shifts + selects — cheap.
    i = pl.program_id(0)
    grow = jax.lax.broadcasted_iota(jnp.int32, sval.shape, 0) + (i * bx - 1)
    s_up = jnp.concatenate([sval[1:], sval[-1:]], axis=0)
    s_dn = jnp.concatenate([sval[:1], sval[:-1]], axis=0)
    sval = jnp.where(grow < 0, s_up,
                     jnp.where(grow > x_true - 1, s_dn, sval))

    # MATERIALIZE s through a VMEM->VMEM async copy. This is a deliberate
    # scheduling barrier: fusing the K-tap x-pass into the eigen chain in
    # SSA form measured 59MB of register-allocator spill slots at 512^3
    # (slower than the staged path, and OOM at 16-row blocks); a plain
    # scratch store gets store-forwarded back into the same fused
    # expression. The compiler cannot forward values across a DMA, so the
    # x-pass/divide intermediates are dead before the stencil/eigen chain
    # schedules. Cost: one 3MB on-chip copy per grid step — noise.
    s_src[:] = sval
    cp = pltpu.make_async_copy(s_src, s_dst, sem_s)
    cp.start()
    cp.wait()
    s = s_dst[:, : by + 2, :]

    core, dxx, dyy, dzz, dxy, dxz, dyz, dx_c, dy, dz_c = _stencil_block(
        s, hx, hy, hz, zshift=zshift
    )
    gm = jnp.sqrt(dx_c * dx_c + dy * dy + dz_c * dz_c)
    feats = eigenvalue_feature_channels(
        dxx, dxy, dxz, dyy, dyz, dzz, use_trig=False, diag_path=False
    )
    inside = m_ref[:] != 0
    zero = jnp.asarray(0, dt)
    o0[:] = jnp.where(inside, core, zero)
    o1[:] = jnp.where(inside, gm, zero)
    for ref, val in zip((o2, o3, o4, o5, o6, o7), feats):
        ref[:] = jnp.where(inside, val, zero)


def _features8_tap_kernel(n_hbm, c_hbm, o0, o1, o2, o3, o4, o5, o6,
                          o7, n_s, c_s, s_src, s_dst, sem_n, sem_c, sem_s,
                          *, bx, by, yk, nxw, wyw, rx, ry, x_true, y_true,
                          taps_x, taps_y, taps_z, hx, hy, hz, n_buf, zshift):
    """features8 with ALL THREE smoothing axes + the normalized-convolution
    divide folded into the post-smoothing pass — zero XLA passes, zero HBM
    intermediates: inputs are the RAW numerator (image*mask) and
    denominator (mask) volumes.

    Round 2's fully-fused attempt (in-kernel MXU band matmuls + persistent
    scratch) was no faster than staged and mis-lowered on chip
    (docs/design.md); this kernel keeps the in-kernel smoothing strictly
    VPU-shaped instead: x taps are leading-axis slices (free addressing),
    y taps are sublane-axis slices, z taps are edge-clamped incremental
    lane shifts — pure FMA chains, no matmuls, no cross-step state. The
    separable FIR + no-epsilon divide semantics are those of reference
    NormalizedGaussianConvolutionImageFilter.hxx:40-63; everything
    downstream of the divide is the byte-identical code path of the proven
    _features8_kernel (ImageToEmphysemaFeaturesFilter.hxx:14-55).

    Boundary handling: the host edge-pads x by rx+1 and y by ry+1, so the
    in-window smoothing sees clamp (ZeroFluxNeumann) data at true volume
    faces — exactly the FIR path's own boundary. The stencil additionally
    needs s(-1) := s(0) on the SMOOTHED image; the window's phantom
    boundary rows/columns hold "smoothing evaluated outside the volume"
    instead, so they are re-clamped by global row AND column index before
    the stencil chain (the xs kernel's row trick, applied to both axes).
    Along z the volume is full-extent in the window: the incremental
    clamped lane shifts compose to s[min(max(z+k, 0), Z-1)], and any
    lane-alignment padding replicates the last true plane, which is the
    same value the clamp would produce.

    There is NO separate mask input: the denominator window IS the
    (clamped, float) mask, so the output masking reads the mask block
    straight out of cwin's core — one full volume of HBM read traffic and
    one VMEM block stream saved.
    """
    nwin, cwin = _two_windows(n_hbm, c_hbm, n_s, c_s, sem_n, sem_c, bx, by,
                              wyw, nxw, n_buf)
    dt = nwin.dtype
    nx1 = bx + 2

    if zshift == "copyfloor":
        # roofline probe: same window DMA traffic + 8 output blocks,
        # near-zero compute — measures this kernel shape's DMA floor
        cn = nwin[rx + 1:rx + 1 + bx, ry + 1:ry + 1 + by, :]
        cc = cwin[rx + 1:rx + 1 + bx, ry + 1:ry + 1 + by, :]
        for k, ref in enumerate((o0, o1, o2, o3, o4, o5, o6, o7)):
            ref[:] = (cn if k % 2 else cc) + jnp.asarray(float(k), dt)
        return

    def xpass(a):
        acc = jnp.asarray(taps_x[0], dt) * a[0:nx1]
        for t in range(1, len(taps_x)):
            acc = acc + jnp.asarray(taps_x[t], dt) * a[t:t + nx1]
        return acc

    def ypass(a):
        acc = jnp.asarray(taps_y[0], dt) * a[:, 0:yk, :]
        for t in range(1, len(taps_y)):
            acc = acc + jnp.asarray(taps_y[t], dt) * a[:, t:t + yk, :]
        return acc

    zsh = _clamp_shift_z_roll if zshift == "roll" else _clamp_shift_z

    def zpass(a):
        rz = (len(taps_z) - 1) // 2
        acc = jnp.asarray(taps_z[rz], dt) * a
        up, dn = a, a
        for k in range(1, rz + 1):
            up = zsh(up, 1)
            dn = zsh(dn, -1)
            acc = acc + jnp.asarray(taps_z[rz + k], dt) * up
            acc = acc + jnp.asarray(taps_z[rz - k], dt) * dn
        return acc

    def smooth(a):
        return zpass(ypass(xpass(a)))

    sval = smooth(nwin) / smooth(cwin)  # (nx1, yk, Z)

    # true-edge clamp of the smoothed phantom halo rows AND columns (see
    # docstring). Window row r is global row i*bx - 1 + r, column c is
    # global column j*by - 1 + c; positions outside the volume copy their
    # inward neighbor. Two leading-axis + two sublane shifts with selects.
    i = pl.program_id(0)
    j = pl.program_id(1)
    grow = jax.lax.broadcasted_iota(jnp.int32, sval.shape, 0) + (i * bx - 1)
    s_up = jnp.concatenate([sval[1:], sval[-1:]], axis=0)
    s_dn = jnp.concatenate([sval[:1], sval[:-1]], axis=0)
    sval = jnp.where(grow < 0, s_up,
                     jnp.where(grow > x_true - 1, s_dn, sval))
    gcol = jax.lax.broadcasted_iota(jnp.int32, sval.shape, 1) + (j * by - 1)
    s_l = jnp.concatenate([sval[:, 1:, :], sval[:, -1:, :]], axis=1)
    s_r = jnp.concatenate([sval[:, :1, :], sval[:, :-1, :]], axis=1)
    sval = jnp.where(gcol < 0, s_l,
                     jnp.where(gcol > y_true - 1, s_r, sval))

    # DMA-barrier materialization of s (same rationale as the xs kernel:
    # the compiler store-forwards a plain scratch store back into one giant
    # fused expression and spills; it cannot forward across a DMA)
    s_src[:] = sval
    cp = pltpu.make_async_copy(s_src, s_dst, sem_s)
    cp.start()
    cp.wait()
    s = s_dst[:, : by + 2, :]

    core, dxx, dyy, dzz, dxy, dxz, dyz, dx_c, dy, dz_c = _stencil_block(
        s, hx, hy, hz, zshift=zshift
    )
    gm = jnp.sqrt(dx_c * dx_c + dy * dy + dz_c * dz_c)
    feats = eigenvalue_feature_channels(
        dxx, dxy, dxz, dyy, dyz, dzz, use_trig=False, diag_path=False
    )
    # the mask block is cwin's core (window row r = global i*bx - 1 + r
    # - ... shifted by the rx+1 pad, so the core starts at rx+1, ry+1)
    inside = cwin[rx + 1:rx + 1 + bx, ry + 1:ry + 1 + by, :] != 0
    zero = jnp.asarray(0, dt)
    o0[:] = jnp.where(inside, core, zero)
    o1[:] = jnp.where(inside, gm, zero)
    for ref, val in zip((o2, o3, o4, o5, o6, o7), feats):
        ref[:] = jnp.where(inside, val, zero)


def _features8_sweep_kernel(clamp_ref, im_ref, mk_ref, o0, o1, o2, o3, o4,
                            o5, o6, o7, ring_n, ring_m, s_carry, *, R,
                            n_blocks, bx, L, rx, taps_x, taps_y, taps_z,
                            hx, hy, hz, z_true):
    """Line-sweep features8: bx rows of all 8 channels per grid step.

    Streaming structure (the tap kernel without windows): input rows live
    in an R-row ring buffer in VMEM (R a multiple of bx, R >= 2*rx+2+2*bx
    for overwrite safety), addressed by dynamic row slices — no halo
    windows, no read amplification, no scratch shifting. Step i appends
    input block i (bx rows; past the volume end the block is replaced by
    a broadcast of the last true row, the clamp replica), completes the
    smoothing of bx rows from the ring (x taps are 2*rx+1 dynamic ring
    reads per row; y and z taps are edge-clamped shifts on the full-extent
    rows), maintains a (bx+2)-row carried window of the smoothed field,
    and emits feature block k = i - L via a lagged output index map
    (L = ceil((rx+1)/bx)). HBM traffic = read image+mask once + write the
    8 channels — the op's true lower bound.

    Seeding: at step 0 every ring row is filled with row 0, which is
    exactly the clamp value every negative row position would hold; the
    ring is large enough that a seeded slot is only overwritten after its
    last phantom read.

    clamp_ref (SMEM, (4,) int32: x_lo, x_hi, y_lo, y_hi): the TRUE-face
    rows/columns where the STENCIL's ZeroFluxNeumann phantom must clamp
    to the smoothed field itself (the smoothed-at-phantom value is NOT
    the clamp neighbor). For a whole volume these are simply
    (0, X-1, 0, Y-1); for a halo-extended shard they are the kept core's
    faces on true-volume sides and +-2^30 sentinels on interior shard
    boundaries, where the halo rows carry REAL neighbor data the stencil
    should consume. DYNAMIC (per-shard axis_index) on purpose — the
    round-5 verify gate caught the static version computing
    smooth(replicated-raw) instead of the clamp at true faces of
    sharded runs (35-50% error on derivative channels in the two
    outermost layers; r5_probe22, regression test
    test_sweep_halo_extended_clamps).

    Semantics: reference ImageToEmphysemaFeaturesFilter.hxx:14-55 +
    NormalizedGaussianConvolutionImageFilter.hxx:40-63 end to end.
    """
    i = pl.program_id(0)
    dt = im_ref.dtype

    mkcur = jnp.clip(mk_ref[:], 0, 1)
    numcur = im_ref[:] * mkcur
    # tail steps re-read the last block; the clamp replica is its LAST row
    last_n = jnp.broadcast_to(numcur[-1:], numcur.shape)
    last_m = jnp.broadcast_to(mkcur[-1:], mkcur.shape)
    tail = i >= n_blocks
    app_n = jnp.where(tail, last_n, numcur)
    app_m = jnp.where(tail, last_m, mkcur)

    @pl.when(i == 0)
    def _():
        for r in range(R):
            ring_n[pl.ds(r, 1)] = numcur[0:1]
            ring_m[pl.ds(r, 1)] = mkcur[0:1]

    # unconditional: at step 0 this overwrites the just-seeded slots
    # 0..bx-1 with the real block-0 rows (the seed only provides the
    # negative-row clamp replicas)
    base = jax.lax.rem(jnp.int32(i) * bx, jnp.int32(R))
    ring_n[pl.ds(base, bx)] = app_n
    ring_m[pl.ds(base, bx)] = app_m

    k = i - L  # the feature block emitted this step

    def read(ring, r):
        # ring row of global row r (r may be negative in the prologue; its
        # slot still holds the row-0 seed, the correct clamp value)
        rr = jnp.int32(R)
        slot = jax.lax.rem(jax.lax.rem(jnp.int32(r), rr) + rr, rr)
        return ring[pl.ds(slot, 1)]

    def xpass_row(ring, t):
        acc = jnp.asarray(taps_x[0], dt) * read(ring, t - rx)
        for j in range(1, len(taps_x)):
            acc = acc + jnp.asarray(taps_x[j], dt) * read(ring, t - rx + j)
        return acc

    def taps_1d(a, taps, shift):
        r = (len(taps) - 1) // 2
        acc = jnp.asarray(taps[r], dt) * a
        up, dn = a, a
        for kk in range(1, r + 1):
            up = shift(up, 1)
            dn = shift(dn, -1)
            acc = acc + jnp.asarray(taps[r + kk], dt) * up
            acc = acc + jnp.asarray(taps[r - kk], dt) * dn
        return acc

    def smooth_yz(a):
        a = taps_1d(a, taps_y, _clamp_shift_y)
        return taps_1d(a, taps_z, _clamp_shift_z)

    # carried window shift: rows [k*bx-1, k*bx] are the last two of the
    # previous step's window
    s_carry[pl.ds(0, 1)] = s_carry[pl.ds(bx, 1)]
    s_carry[pl.ds(1, 1)] = s_carry[pl.ds(bx + 1, 1)]
    # complete the smoothing of bx new rows t = k*bx + 1 + sub
    for sub in range(bx):
        t = (jnp.int32(k)) * bx + 1 + sub
        s_new = smooth_yz(xpass_row(ring_n, t)) / smooth_yz(
            xpass_row(ring_m, t))
        s_carry[pl.ds(2 + sub, 1)] = s_new

    s = s_carry[:]  # (bx+2, Yp, Z): smoothed rows k*bx-1 .. k*bx+bx
    sm = s[:-2]
    s0 = s[1:-1]
    sp = s[2:]
    # stencil phantom clamp at the TRUE faces (see docstring): dynamic
    # rows/columns from clamp_ref so halo-extended shard blocks clamp at
    # the kept core's true faces, not the extension's
    grow = jax.lax.broadcasted_iota(jnp.int32, s0.shape, 0) + k * bx
    sm = jnp.where(grow <= clamp_ref[0], s0, sm)
    sp = jnp.where(grow >= clamp_ref[1], s0, sp)
    col = jax.lax.broadcasted_iota(jnp.int32, s0.shape, 1)
    mrows = jnp.concatenate(
        [read(ring_m, k * bx + r) for r in range(bx)], axis=0)
    _emit_features8(
        (o0, o1, o2, o3, o4, o5, o6, o7), mrows != 0, s0, sm, sp,
        _true_face_yshift(clamp_ref[2], clamp_ref[3], col), hx, hy, hz,
        zshift=_true_face_zshift(z_true - 1))


def _features8_xs_stream_kernel(n_ref, d_ref, m_ref, o0, o1, o2, o3, o4,
                                o5, o6, o7, ring_n, ring_d, s_carry, *, R,
                                n_blocks, bx, L, rx, taps_x, hx, hy, hz,
                                x_true):
    """Streaming xs features8: the x-axis Gaussian pass, the no-epsilon
    normalized-convolution divide, and the whole gradient/Hessian/eigen/
    mask chain in ONE pass over the y/z-smoothed numerator and
    denominator volumes.

    Structure = _features8_sweep_kernel minus the y/z taps (those axes
    arrive pre-smoothed on the MXU band einsums, which are
    radius-independent — r4_probe14/15): input rows ring-buffered in
    VMEM, x taps as dynamic ring reads, lagged output map
    (L = ceil((rx+1)/bx)). vs the fully-staged path (6 MXU passes +
    divide + post_stream) this removes the two x-axis MXU passes, the
    divide pass, and the smoothed volume's full HBM round trip — per
    scale: 11 volume traversals instead of ~18. The VMEM rings scale
    with the x radius only (2 fields x (2rx+4) rows), so this serves
    radii whose rings fit next to the block pipeline — the whole bench
    scale range at 256^2 slices, rx <= ~9 at 512^2.

    The mask block rides the OUTPUT index map (consumed when block
    i-L's features are emitted), exactly like the post_stream kernel.
    Semantics: reference NormalizedGaussianConvolutionImageFilter
    .hxx:40-63 (x stage + divide) + ImageToEmphysemaFeaturesFilter
    .hxx:14-55 (feature chain + masking).
    """
    i = pl.program_id(0)
    dt = n_ref.dtype

    ncur = n_ref[:]
    dcur = d_ref[:]
    # tail steps re-read the last block; the clamp replica is its LAST
    # row (ZeroFluxNeumann of the y/z-smoothed field along x — exactly
    # gaussian_smooth_axis(axis=0)'s edge pad on that field)
    tail = i >= n_blocks
    app_n = jnp.where(tail, jnp.broadcast_to(ncur[-1:], ncur.shape), ncur)
    app_d = jnp.where(tail, jnp.broadcast_to(dcur[-1:], dcur.shape), dcur)

    @pl.when(i == 0)
    def _():
        for r in range(R):
            ring_n[pl.ds(r, 1)] = ncur[0:1]
            ring_d[pl.ds(r, 1)] = dcur[0:1]

    base = jax.lax.rem(jnp.int32(i) * bx, jnp.int32(R))
    ring_n[pl.ds(base, bx)] = app_n
    ring_d[pl.ds(base, bx)] = app_d

    k = i - L  # the feature block emitted this step

    def read(ring, r):
        rr = jnp.int32(R)
        slot = jax.lax.rem(jax.lax.rem(jnp.int32(r), rr) + rr, rr)
        return ring[pl.ds(slot, 1)]

    def xpass_row(ring, t):
        acc = jnp.asarray(taps_x[0], dt) * read(ring, t - rx)
        for j in range(1, len(taps_x)):
            acc = acc + jnp.asarray(taps_x[j], dt) * read(ring, t - rx + j)
        return acc

    # carried smoothed window: rows [k*bx-1, k*bx] are the last two of
    # the previous step's window; complete bx new smoothed rows
    s_carry[pl.ds(0, 1)] = s_carry[pl.ds(bx, 1)]
    s_carry[pl.ds(1, 1)] = s_carry[pl.ds(bx + 1, 1)]
    for sub in range(bx):
        t = jnp.int32(k) * bx + 1 + sub
        s_carry[pl.ds(2 + sub, 1)] = xpass_row(ring_n, t) / xpass_row(
            ring_d, t)

    s = s_carry[:]  # (bx+2, Yp, Z): smoothed rows k*bx-1 .. k*bx+bx
    sm = s[:-2]
    s0 = s[1:-1]
    sp = s[2:]
    # stencil phantom-row clamp at the true x faces: the smoothed-at-
    # phantom value is NOT the ZeroFluxNeumann neighbor of the stencil.
    # This entry serves whole volumes (sharded callers use the sweep
    # kernels), so the true faces are static; y pads are replicas of
    # the ALREADY-smoothed field, so the plain y clamp is exact.
    grow = jax.lax.broadcasted_iota(jnp.int32, s0.shape, 0) + k * bx
    sm = jnp.where(grow <= 0, s0, sm)
    sp = jnp.where(grow >= x_true - 1, s0, sp)
    _emit_features8(
        (o0, o1, o2, o3, o4, o5, o6, o7), m_ref[:] != 0, s0, sm, sp,
        _clamp_shift_y, hx, hy, hz)


def _banded_dot(W, x2d, radius, precision, B=128):
    """Band-aware in-kernel contraction out = W @ x2d for a band matrix
    W (Y, Y) of half-width `radius`: static output blocks of B rows each
    contract only their (B + 2*radius)-row input window — the MXU flops
    track the band width, not Y (2.8x at Y=512, r=28). Slicing the same
    dense W preserves the edge-replication rows exactly (the
    stencil-module _blocked_band_axis argument, in-kernel)."""
    Y = x2d.shape[0]
    dn = (((1,), (0,)), ((), ()))
    if Y <= B + 2 * radius:
        return jax.lax.dot_general(
            W, x2d, dn, precision=precision,
            preferred_element_type=x2d.dtype)
    outs = []
    for t in range(0, Y, B):
        b1 = min(t + B, Y)
        lo = max(0, t - radius)
        hi = min(Y, b1 + radius)
        outs.append(jax.lax.dot_general(
            W[t:b1, lo:hi], x2d[lo:hi], dn, precision=precision,
            preferred_element_type=x2d.dtype))
    return jnp.concatenate(outs, axis=0)


def _features8_ys_multi_kernel(*refs, S, n_x, radii, hx, hy, hz):
    """Multi-scale streaming ys features8: for each of S scales, the
    y-axis Gaussian (an IN-KERNEL banded MXU contraction against the
    scale's band matrix), the no-epsilon normalized-convolution divide,
    and the gradient/Hessian/eigen/mask chain — ONE pass over the
    x/z-pre-smoothed numerator/denominator volumes of all scales.

    This is the round-2 "in-kernel MXU smoothing" retried deliberately
    under the on-chip verify gate (round-4 VERDICT weak-2/next-3): the
    round-2 failure used persistent cross-step matmul state; here each
    step's contraction is a pure function of the step's own input block
    (y is full-extent in the block), and the cross-step state is only
    the proven post_stream carried x-halo (prev/prev_last per scale,
    lagged output map, bx=1).

    Why: each scale's post chain shares this kernel's launch + block
    pipeline, and the y smoothing rides the MXU inside it — per scale
    the staged path's y-axis MXU passes (2), divide pass, and smoothed
    volume round trip disappear. At 256^3 (config 3) the per-kernel
    launch overhead was the measured ceiling (r4_probe17); this runs
    ALL scales' tails in one launch.

    refs layout: S nums, S dens, mask, S band matrices (Yp, Yp), then
    8*S outputs and 2*S scratches (prev, prev_last per scale). The mask
    rides the OUTPUT index map. Semantics per scale: reference
    NormalizedGaussianConvolutionImageFilter.hxx:40-63 +
    ImageToEmphysemaFeaturesFilter.hxx:14-55.
    """
    n_refs = refs[:S]
    d_refs = refs[S : 2 * S]
    m_ref = refs[2 * S]
    w_refs = refs[2 * S + 1 : 3 * S + 1]
    o_refs = refs[3 * S + 1 : 3 * S + 1 + 8 * S]
    prevs = refs[3 * S + 1 + 8 * S : 3 * S + 1 + 9 * S]
    lasts = refs[3 * S + 1 + 9 * S :]
    i = pl.program_id(0)
    from ife_tpu.ops.stencil import MATMUL_PRECISION as prec

    inside = m_ref[:] != 0

    for s in range(S):
        W = w_refs[s][:]
        num2 = _banded_dot(W, n_refs[s][0], radii[s], prec)
        den2 = _banded_dot(W, d_refs[s][0], radii[s], prec)
        cur = (num2 / den2)[None]  # (1, Yp, Z): smoothed row i

        @pl.when(i > 0)
        def _(s=s, cur=cur):
            s0 = prevs[s][:]          # smoothed row i-1 (emitted now)
            sm = lasts[s][:]          # row i-2 (or the row -1 clamp)
            sp = jnp.where(i == n_x, s0, cur)  # row i (or the clamp)
            # y pads are exactly s(Y-1) by the clamp-folded band matrix
            # (see the wrapper), so the plain y clamp is exact
            _emit_features8(
                o_refs[8 * s : 8 * s + 8], inside, s0, sm, sp,
                _clamp_shift_y, hx, hy, hz)

        @pl.when(i == 0)
        def _(s=s, cur=cur):
            # seed: row -1 := row 0 (ZeroFluxNeumann at the low x face);
            # the lagged block-0 write is overwritten at step 1
            lasts[s][:] = cur
            for k in range(8):
                o_refs[8 * s + k][:] = jnp.zeros_like(cur)

        @pl.when(i > 0)
        def _(s=s):
            lasts[s][:] = prevs[s][:]

        prevs[s][:] = cur


def _features8_sweep_multi_kernel(clamp_ref, im_ref, mk_ref, *refs, R,
                                  n_blocks, bx, L, rx_list, taps_lists,
                                  hx, hy, hz, z_true):
    """S-scale line-sweep features8 sharing ONE pair of input rings: the
    raw image/mask rows are identical for every scale, so S scales read
    them once (the per-scale sweeps each paid their own full input read
    AND kernel launch — at 256^3 the launch overhead is the measured
    config-3 ceiling, r4_probe17). Per grid step, each scale completes
    its own smoothing of the emitted rows from the shared rings (its own
    tap radii), carries its own (bx+2)-row smoothed window, and emits
    its 8 channels; all scales share the lag L = ceil((rx_max+1)/bx)
    and the ring size of the LARGEST radius, which retains every row a
    smaller radius needs by construction. Structure, seeding, clamp
    semantics: identical to _features8_sweep_kernel per scale.

    refs layout: 8*S outputs, then ring_n, ring_m, then S s_carry
    scratches."""
    S = len(rx_list)
    o_refs = refs[: 8 * S]
    ring_n = refs[8 * S]
    ring_m = refs[8 * S + 1]
    carries = refs[8 * S + 2 :]
    i = pl.program_id(0)
    dt = im_ref.dtype

    mkcur = jnp.clip(mk_ref[:], 0, 1)
    numcur = im_ref[:] * mkcur
    tail = i >= n_blocks
    app_n = jnp.where(tail, jnp.broadcast_to(numcur[-1:], numcur.shape),
                      numcur)
    app_m = jnp.where(tail, jnp.broadcast_to(mkcur[-1:], mkcur.shape),
                      mkcur)

    @pl.when(i == 0)
    def _():
        for r in range(R):
            ring_n[pl.ds(r, 1)] = numcur[0:1]
            ring_m[pl.ds(r, 1)] = mkcur[0:1]

    base = jax.lax.rem(jnp.int32(i) * bx, jnp.int32(R))
    ring_n[pl.ds(base, bx)] = app_n
    ring_m[pl.ds(base, bx)] = app_m

    k = i - L

    def read(ring, r):
        rr = jnp.int32(R)
        slot = jax.lax.rem(jax.lax.rem(jnp.int32(r), rr) + rr, rr)
        return ring[pl.ds(slot, 1)]

    x_lo = clamp_ref[0]
    x_hi = clamp_ref[1]
    y_lo = clamp_ref[2]
    y_hi = clamp_ref[3]
    mrows = jnp.concatenate(
        [read(ring_m, k * bx + r) for r in range(bx)], axis=0)
    inside = mrows != 0

    for sc in range(S):
        rx = rx_list[sc]
        taps_x, taps_y, taps_z = taps_lists[sc]
        s_carry = carries[sc]

        def xpass_row(ring, t, taps_x=taps_x, rx=rx):
            acc = jnp.asarray(taps_x[0], dt) * read(ring, t - rx)
            for j in range(1, len(taps_x)):
                acc = acc + jnp.asarray(taps_x[j], dt) * read(
                    ring, t - rx + j)
            return acc

        def taps_1d(a, taps, shift):
            r = (len(taps) - 1) // 2
            acc = jnp.asarray(taps[r], dt) * a
            up, dn = a, a
            for kk in range(1, r + 1):
                up = shift(up, 1)
                dn = shift(dn, -1)
                acc = acc + jnp.asarray(taps[r + kk], dt) * up
                acc = acc + jnp.asarray(taps[r - kk], dt) * dn
            return acc

        def smooth_yz(a, taps_y=taps_y, taps_z=taps_z):
            a = taps_1d(a, taps_y, _clamp_shift_y)
            return taps_1d(a, taps_z, _clamp_shift_z)

        s_carry[pl.ds(0, 1)] = s_carry[pl.ds(bx, 1)]
        s_carry[pl.ds(1, 1)] = s_carry[pl.ds(bx + 1, 1)]
        for sub in range(bx):
            t = jnp.int32(k) * bx + 1 + sub
            s_new = smooth_yz(xpass_row(ring_n, t)) / smooth_yz(
                xpass_row(ring_m, t))
            s_carry[pl.ds(2 + sub, 1)] = s_new

        s = s_carry[:]
        sm = s[:-2]
        s0 = s[1:-1]
        sp = s[2:]
        grow = jax.lax.broadcasted_iota(jnp.int32, s0.shape, 0) + k * bx
        sm = jnp.where(grow <= x_lo, s0, sm)
        sp = jnp.where(grow >= x_hi, s0, sp)
        col = jax.lax.broadcasted_iota(jnp.int32, s0.shape, 1)
        _emit_features8(
            o_refs[8 * sc : 8 * sc + 8], inside, s0, sm, sp,
            _true_face_yshift(y_lo, y_hi, col), hx, hy, hz,
            zshift=_true_face_zshift(z_true - 1))


def _nc_sweep_kernel(im_ref, mk_ref, o_ref, ring_n, ring_m, *, R,
                     rx, taps_x, taps_y, taps_z):
    """Line-sweep normalized Gaussian convolution: one smoothed row per
    grid step, straight from the raw image + mask. The sweep-features8
    kernel minus the stencil/eigen tail: input rows ring-buffered in VMEM,
    x taps as dynamic ring reads, y/z taps as edge-clamped shifts on the
    full-extent row, the no-epsilon divide
    (NormalizedGaussianConvolutionImageFilter.hxx:40-63), and a lagged
    output index map (step i emits row i - rx). HBM traffic = read
    image + mask once + write s: 3 volumes, vs 8 for the staged
    6-MXU-pass + divide pipeline."""
    i = pl.program_id(0)
    dt = im_ref.dtype

    # certainty used RAW — no clip: the reference filter consumes the
    # certainty image as given (NormalizedGaussianConvolutionImageFilter
    # .hxx:40-63); the features8 callers clamp before calling, matching
    # the reference's own ClampImageFilter placement
    mkcur = mk_ref[:]
    numcur = im_ref[:] * mkcur

    @pl.when(i == 0)
    def _():
        for r in range(R):
            ring_n[pl.ds(r, 1)] = numcur[0:1]
            ring_m[pl.ds(r, 1)] = mkcur[0:1]

    # unconditional: overwrites the seeded slot with the real row (blocks
    # past the end re-read the last row — already the clamp replica)
    base = jax.lax.rem(jnp.int32(i), jnp.int32(R))
    ring_n[pl.ds(base, 1)] = numcur
    ring_m[pl.ds(base, 1)] = mkcur

    t = i - rx  # the smoothed row emitted this step

    def read(ring, r):
        rr = jnp.int32(R)
        slot = jax.lax.rem(jax.lax.rem(jnp.int32(r), rr) + rr, rr)
        return ring[pl.ds(slot, 1)]

    def xpass(ring):
        acc = jnp.asarray(taps_x[0], dt) * read(ring, t - rx)
        for j in range(1, len(taps_x)):
            acc = acc + jnp.asarray(taps_x[j], dt) * read(ring, t - rx + j)
        return acc

    def taps_1d(a, taps, shift):
        r = (len(taps) - 1) // 2
        acc = jnp.asarray(taps[r], dt) * a
        up, dn = a, a
        for kk in range(1, r + 1):
            up = shift(up, 1)
            dn = shift(dn, -1)
            acc = acc + jnp.asarray(taps[r + kk], dt) * up
            acc = acc + jnp.asarray(taps[r - kk], dt) * dn
        return acc

    def smooth_yz(a):
        a = taps_1d(a, taps_y, _clamp_shift_y)
        return taps_1d(a, taps_z, _clamp_shift_z)

    o_ref[:] = smooth_yz(xpass(ring_n)) / smooth_yz(xpass(ring_m))


@functools.partial(
    jax.jit, static_argnames=("sigma", "spacing", "truncate", "interpret")
)
def fused_normalized_conv_sweep(
    image: jax.Array,
    mask: jax.Array,
    sigma: float,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    truncate: float = 4.5,
    interpret: bool = False,
):
    """Masked (normalized) Gaussian convolution as ONE line-sweep Pallas
    pass: out = G_sigma*(mask*image) / G_sigma*mask with ZeroFluxNeumann
    boundaries, read image+mask once, write s once (3 volumes of HBM
    traffic vs 8 for the staged 6-pass MXU pipeline). Semantics: reference
    NormalizedGaussianConvolutionImageFilter.hxx:40-63; the no-epsilon
    divide's nan/inf lives only outside the mask support, exactly like
    the reference. Serves sigma where the two input rings fit VMEM
    (sigma <= ~4 at 0.78 mm spacing on a 512^2 slice)."""
    hx, hy, hz = (float(v) for v in spacing)
    taps_x, rx = _smooth_taps(float(sigma), hx, float(truncate))
    taps_y, _ = _smooth_taps(float(sigma), hy, float(truncate))
    taps_z, _ = _smooth_taps(float(sigma), hz, float(truncate))

    X, Y, Zin = image.shape
    m = mask.astype(image.dtype)
    Z = Zin if interpret else -(-Zin // 128) * 128
    Yp = Y if interpret else -(-Y // 8) * 8
    if (Yp, Z) != (Y, Zin):
        pads = ((0, 0), (0, Yp - Y), (0, Z - Zin))
        image = jnp.pad(image, pads, mode="edge")
        m = jnp.pad(m, pads, mode="edge")
    R = 2 * rx + 3

    kernel = functools.partial(
        _nc_sweep_kernel, R=R, rx=rx, taps_x=taps_x,
        taps_y=taps_y, taps_z=taps_z,
    )
    in_spec = pl.BlockSpec(
        (1, Yp, Z), lambda i: (jnp.minimum(i, X - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, Yp, Z), lambda i: (jnp.maximum(i - rx, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(X + rx,),
        in_specs=[in_spec, in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((X, Yp, Z), image.dtype),
        scratch_shapes=[
            pltpu.VMEM((R, Yp, Z), image.dtype),
            pltpu.VMEM((R, Yp, Z), image.dtype),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(image, m)
    if (Yp, Z) != (Y, Zin):
        out = out[:, :Y, :Zin]
    return out


@functools.partial(
    jax.jit, static_argnames=("sigma", "spacing", "truncate", "n_tiles",
                              "interpret")
)
def fused_normalized_conv_sweep_tiled(
    image: jax.Array,
    mask: jax.Array,
    sigma: float,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    truncate: float = 4.5,
    n_tiles: int = 2,
    interpret: bool = False,
):
    """fused_normalized_conv_sweep for radii whose input rings do NOT fit
    VMEM at full Y extent: the volume is split into n_tiles contiguous Y
    slabs, each extended by the smoothing radius (real neighbor rows —
    sliced straight from the device array), swept independently, and the
    kept slabs reassembled. Outputs in a kept slab never touch a
    tile-edge clamp (taps reach at most `radius` into the extension), and
    the first/last tiles' outer edges ARE the volume edges, so the
    kernel's own clamp is exact there. Read amplification:
    (Y + (n_tiles-1)*2*ry) / Y on the two input volumes; the single
    output volume is written once.

    Extends the nc sweep's service range to sigma ~9 at 0.78 mm on a
    512^2 slice with n_tiles=2 (vs ~4.2 untiled) — past the whole
    benchmark scale range; the MXU band-einsum path remains for anything
    larger."""
    _, ry = _smooth_taps(float(sigma), float(spacing[1]), float(truncate))
    Y = image.shape[1]
    bounds = [round(t * Y / n_tiles) for t in range(n_tiles + 1)]
    outs = []
    for t in range(n_tiles):
        y0, y1 = bounds[t], bounds[t + 1]
        e0 = max(0, y0 - ry)
        e1 = min(Y, y1 + ry)
        o = fused_normalized_conv_sweep(
            image[:, e0:e1, :], mask[:, e0:e1, :], float(sigma),
            tuple(spacing), float(truncate), interpret=interpret,
        )
        outs.append(o[:, y0 - e0 : y0 - e0 + (y1 - y0), :])
    return jnp.concatenate(outs, axis=1)


@functools.lru_cache(maxsize=256)
def _smooth_taps(sigma: float, spacing: float, truncate: float):
    """(taps tuple, radius) for one axis; sigma<=0 -> identity."""
    from ife_tpu.ops.stencil import _gaussian_taps, gaussian_radius

    if sigma <= 0:
        return (1.0,), 0
    sigma_vox = float(sigma) / float(spacing)
    radius = gaussian_radius(sigma_vox, truncate)
    return tuple(float(t) for t in _gaussian_taps(sigma_vox, radius)), radius


def _pick_block(n: int, target: int):
    """(block, padded_n). Block sizes must divide the gridded extent: use
    the largest divisor of n <= target when it is within 3/4 of the target;
    otherwise keep the target block and edge-pad n up to a multiple (a
    prime extent would otherwise degrade to 1-row blocks, tripling the
    halo-window read amplification and exploding the grid — the padded
    rows are replicates whose outputs are sliced away)."""
    b = min(target, n)
    d = b
    while n % d:
        d -= 1
    if 4 * d >= 3 * b:
        return d, n
    return b, -(-n // b) * b


# Mosaic's default scoped-VMEM limit is 16MB, but v5e has 128MB physical
# VMEM; block16 x 6 outputs with double buffering measured 16.43M — over
# the default limit by a hair (and dependent on allocator luck), so raise
# the limit instead of shrinking the pipeline. 112M leaves ~16M headroom
# under the 128M physical cap for compiler temporaries.
_VMEM_LIMIT = 112 * 1024 * 1024


def _pick_n_buf(bx: int, by: int, wy: int, Z: int, n_out: int,
                itemsize: int) -> int:
    """2 input slots when the (raised) VMEM budget allows, else 1. Rough
    model: Pallas double-buffers each output block; compiler temporaries
    cost ~6 windows on top."""
    est = itemsize * Z * (
        2 * n_out * bx * by + 8 * (bx + 2) * wy
    )
    return 2 if est <= int(0.8 * _VMEM_LIMIT) else 1


@functools.partial(
    jax.jit, static_argnames=("spacing", "block", "interpret", "stack",
                              "pre_padded", "variant", "n_buf")
)
def fused_hessian_eig(
    x: jax.Array,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    block=(8, 128),
    interpret: bool = False,
    stack: bool = True,
    pre_padded: bool = False,
    variant: str = "concat",
    n_buf: int | None = None,
):
    """Six eigen features of the Hessian in one fused HBM pass.

    Args:
      x: (X, Y, Z) float volume.
      spacing: physical voxel spacing (hx, hy, hz).
      block: target block edge for the X/Y grid, an int or an (bx, by)
        tuple (largest divisors of X/Y are chosen). Wide Y blocks cut the
        halo-window read amplification ((bx+2)/bx * wy/by).
      interpret: run the Pallas interpreter (CPU testing).
      stack: True -> single (6, X, Y, Z) array (channel-first; cheap
        device-side stack); False -> tuple of six (X, Y, Z) arrays.
      pre_padded: x already carries a radius-1 boundary layer on X and Y
        ((X+2, Y+2, Z) for an (X, Y, Z) core) — e.g. a halo-extended shard
        block; skips the internal edge pad.

    Returns:
      [e1, e2, e3, LoG, GaussianCurvature, FrobeniusNorm], eigenvalues
      ordered |e3| <= |e2| <= |e1|. jnp.moveaxis(out, 0, -1) matches
      eigenvalue_features(hessian(x)).
    """
    if pre_padded:
        X, Y, Zin = x.shape[0] - 2, x.shape[1] - 2, x.shape[2]
    else:
        X, Y, Zin = x.shape
    # the manual DMA window's lane extent must be a multiple of the lane
    # tile (128) or Mosaic rejects the memref slice; edge-pad Z up (exactly
    # ZeroFluxNeumann: the clamp shifts see the replicated plane) and
    # slice the outputs back
    Z = Zin if interpret else -(-Zin // 128) * 128
    if Z != Zin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Z - Zin)), mode="edge")
    tx, ty = (block, block) if isinstance(block, int) else block
    bx, Xp = _pick_block(X, tx)
    by, Yp = _pick_block(Y, ty)
    wy = -(-(by + 2) // 8) * 8  # sublane-aligned DMA window extent
    hx, hy, hz = (float(s) for s in spacing)

    # pre-pad with edge replication so interior windows never clamp and true
    # edges get ZeroFluxNeumann — one cheap fused pad pass. The y hi-pad is
    # widened so the aligned DMA window stays in bounds, and both axes are
    # padded up to the (Xp, Yp) grid multiples; the slack voxels never reach
    # a kept output.
    if pre_padded:
        xp = jnp.pad(
            x, ((0, Xp - X), (0, (Yp - Y) + wy - by - 2), (0, 0)), mode="edge"
        )
    else:
        xp = jnp.pad(
            x, ((1, 1 + Xp - X), (1, (Yp - Y) + wy - by - 1), (0, 0)),
            mode="edge",
        )

    if n_buf is None:
        n_buf = _pick_n_buf(bx, by, wy, Z, 6, x.dtype.itemsize)
    kernel = functools.partial(
        _kernel, bx=bx, by=by, wy=wy, hx=hx, hy=hy, hz=hz, n_buf=n_buf,
        variant=variant,
    )
    out_spec = pl.BlockSpec(
        (bx, by, Z), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=(Xp // bx, Yp // by),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((Xp, Yp, Z), x.dtype)] * 6,
        scratch_shapes=[
            pltpu.VMEM((n_buf, bx + 2, wy, Z), x.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
        # no dimension_semantics knob: the grid carries cross-step manual-DMA
        # scheduling and a 'parallel' annotation would let Mosaic reorder
        # steps; probes use their own local pallas_call for that experiment
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xp)
    if (Xp, Yp, Z) != (X, Y, Zin):
        outs = [o[:X, :Y, :Zin] for o in outs]
    if stack:
        return jnp.stack(outs, axis=0)
    return tuple(outs)


@functools.partial(
    jax.jit, static_argnames=("spacing", "block", "interpret", "stack")
)
def fused_hessian_eig_stream(
    x: jax.Array,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    block: int = 4,
    interpret: bool = False,
    stack: bool = True,
    x_halo=None,
):
    """Streaming-halo variant of fused_hessian_eig: 1D grid over x-slabs
    with full (Y, Z) extent per block, the x halo carried across grid
    steps in persistent VMEM (see _stream_kernel), every input/output byte
    moved by Mosaic's own block pipeline — no manual window DMA, no halo
    read amplification. Same outputs/ordering as fused_hessian_eig.

    x_halo: optional ((1, Y, Z), (1, Y, Z)) pair of the volume's x-halo
    ROWS (row -1 and row X). When given, the kernel consumes them at the
    x faces instead of ZeroFluxNeumann clamping — this is how a
    1D-sharded block computes its exact interior derivatives with NO
    halo-extended copy of the block (~3 ms of pure copy saved per pass
    at 512^3, SCALING_TPU1 12.8 -> ~9.5 ms).
    """
    X, Y, Zin = x.shape
    ext_halo = x_halo is not None
    Z = Zin if interpret else -(-Zin // 128) * 128
    Yp = Y if interpret else -(-Y // 8) * 8
    if (Yp, Z) != (Y, Zin):
        pads = ((0, 0), (0, Yp - Y), (0, Z - Zin))
        x = jnp.pad(x, pads, mode="edge")
        if ext_halo:
            x_halo = tuple(jnp.pad(h, pads, mode="edge") for h in x_halo)
    bx, Xp = _pick_block(X, block)
    if Xp != X:
        if ext_halo:
            # slack rows replicate the last row, but row X itself must be
            # the hi halo row (the kept output at row X-1 reads it); this
            # concat costs a copy — only on non-bx-divisible extents
            tail = [x_halo[1]] + [x[-1:]] * (Xp - X - 1)
            x = jnp.concatenate([x] + tail, axis=0)
        else:
            x = jnp.pad(x, ((0, Xp - X), (0, 0), (0, 0)), mode="edge")
    n_x = Xp // bx
    hx, hy, hz = (float(s) for s in spacing)

    kernel = functools.partial(
        _stream_kernel, bx=bx, hx=hx, hy=hy, hz=hz, n_x=n_x,
        ext_halo=ext_halo,
    )
    in_spec = pl.BlockSpec(
        (bx, Yp, Z), lambda i: (jnp.minimum(i, n_x - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    halo_spec = pl.BlockSpec(
        (1, Yp, Z), lambda i: (0, 0, 0), memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (bx, Yp, Z), lambda i: (jnp.maximum(i - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_x + 1,),
        in_specs=[in_spec] + ([halo_spec, halo_spec] if ext_halo else []),
        out_specs=[out_spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((Xp, Yp, Z), x.dtype)] * 6,
        scratch_shapes=[
            pltpu.VMEM((bx, Yp, Z), x.dtype),
            pltpu.VMEM((1, Yp, Z), x.dtype),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(x, *(x_halo if ext_halo else ()))
    if (Xp, Yp, Z) != (X, Y, Zin):
        outs = [o[:X, :Y, :Zin] for o in outs]
    if stack:
        return jnp.stack(outs, axis=0)
    return tuple(outs)


@functools.partial(
    jax.jit, static_argnames=("sigma", "spacing", "truncate", "block",
                              "interpret", "stack")
)
def fused_features8_xs_stream(
    num_yz: jax.Array,
    den_yz: jax.Array,
    mask: jax.Array,
    sigma: float,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    truncate: float = 4.5,
    block: int = 1,
    interpret: bool = False,
    stack: bool = True,
):
    """features8 from the y/z-smoothed numerator (image*mask) and
    denominator (mask) volumes: the x-axis smoothing pass, the no-epsilon
    divide, and the gradient/Hessian/eigen/mask chain in one streaming
    Pallas pass (see _features8_xs_stream_kernel). The staged path's
    replacement tail where the rings fit: removes the two x-axis MXU
    passes, the divide pass, and the smoothed volume's HBM round trip.

    `mask` is the CLAMPED {0,1} mask (callers clamp, mirroring the
    reference's ClampImageFilter placement). Returns (8, X, Y, Z) when
    stack=True, else a tuple of 8 arrays; jnp.moveaxis(out, 0, -1)
    matches ops.features.features8.
    """
    hx, hy, hz = (float(v) for v in spacing)
    taps_x, rx = _smooth_taps(float(sigma), hx, float(truncate))

    X, Y, Zin = num_yz.shape
    m = mask.astype(num_yz.dtype)
    Z = Zin if interpret else -(-Zin // 128) * 128
    Yp = Y if interpret else -(-Y // 8) * 8
    if (Yp, Z) != (Y, Zin):
        # edge replicas: the x-pass is per-column so padded columns stay
        # exact replicas, and the kernel's y/z stencil clamps then read
        # true clamp values at the kept region's faces
        pads = ((0, 0), (0, Yp - Y), (0, Z - Zin))
        num_yz = jnp.pad(num_yz, pads, mode="edge")
        den_yz = jnp.pad(den_yz, pads, mode="edge")
        m = jnp.pad(m, pads, mode="edge")
    bx = max(1, int(block))
    Xp = -(-X // bx) * bx
    if Xp != X:
        padx = ((0, Xp - X), (0, 0), (0, 0))
        num_yz = jnp.pad(num_yz, padx, mode="edge")
        den_yz = jnp.pad(den_yz, padx, mode="edge")
        m = jnp.pad(m, padx, mode="edge")
    n_blocks = Xp // bx
    L = -(-(rx + 1) // bx)
    R = (-(-(2 * rx + 2) // bx) + 2) * bx

    kernel = functools.partial(
        _features8_xs_stream_kernel, R=R, n_blocks=n_blocks, bx=bx, L=L,
        rx=rx, taps_x=taps_x, hx=hx, hy=hy, hz=hz, x_true=X,
    )
    in_spec = pl.BlockSpec(
        (bx, Yp, Z), lambda i: (jnp.minimum(i, n_blocks - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (bx, Yp, Z), lambda i: (jnp.maximum(i - L, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks + L,),
        # the mask rides the OUTPUT (lagged) index map
        in_specs=[in_spec, in_spec, out_spec],
        out_specs=[out_spec] * 8,
        out_shape=[jax.ShapeDtypeStruct((Xp, Yp, Z), num_yz.dtype)] * 8,
        scratch_shapes=[
            pltpu.VMEM((R, Yp, Z), num_yz.dtype),
            pltpu.VMEM((R, Yp, Z), num_yz.dtype),
            pltpu.VMEM((bx + 2, Yp, Z), num_yz.dtype),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(num_yz, den_yz, m)
    if (Xp, Yp, Z) != (X, Y, Zin):
        outs = [o[:X, :Y, :Zin] for o in outs]
    if stack:
        return jnp.stack(outs, axis=0)
    return tuple(outs)


@functools.partial(
    jax.jit, static_argnames=("sigmas", "spacing", "truncate",
                              "interpret", "stack", "pad_to")
)
def fused_features8_ys_multi(
    nums,
    dens,
    mask: jax.Array,
    sigmas,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    truncate: float = 4.5,
    interpret: bool = False,
    stack: bool = True,
    pad_to=None,
):
    """Multi-scale features8 from x/z-pre-smoothed numerator/denominator
    volumes: ONE streaming Pallas pass computes, for every scale, the
    y-axis smoothing (in-kernel banded MXU contraction), the no-epsilon
    divide, and the masked feature chain (_features8_ys_multi_kernel).

    Args:
      nums, dens: tuples of S (X, Y, Z) arrays — G_x G_z * (image*mask)
        and G_x G_z * mask per scale (x and z passes done by the
        radius-independent XLA band einsums).
      mask: the CLAMPED {0,1} mask.
      sigmas: tuple of S scales (static).

    Returns a tuple of S channel-tuples (8 arrays each), or a stacked
    (S, 8, X, Y, Z) array when stack=True.
    """
    nums = tuple(nums)
    dens = tuple(dens)
    S = len(nums)
    if not (S == len(dens) == len(sigmas)):
        raise ValueError("nums/dens/sigmas must have equal length")
    hx, hy, hz = (float(v) for v in spacing)
    X, Y, Zin = nums[0].shape
    m = mask.astype(nums[0].dtype)
    if pad_to is not None:
        # test hook: force the TPU alignment-padding path (incl. the
        # clamp-folded band matrix) under the interpreter, where the
        # natural alignment would be a no-op
        Yp, Z = pad_to
    else:
        Z = Zin if interpret else -(-Zin // 128) * 128
        Yp = Y if interpret else -(-Y // 8) * 8
    if (Yp, Z) != (Y, Zin):
        # edge replicas: the in-kernel y contraction's clamp rows at
        # Yp-1 read exact replicas of row Y-1, composing to the true
        # clamp (pad_to_mesh argument); z pads replicate the smoothed
        # boundary plane, which is what the z stencil clamp wants
        pads = ((0, 0), (0, Yp - Y), (0, Z - Zin))
        nums = tuple(jnp.pad(v, pads, mode="edge") for v in nums)
        dens = tuple(jnp.pad(v, pads, mode="edge") for v in dens)
        m = jnp.pad(m, pads, mode="edge")
    n_x = X

    from ife_tpu.ops.stencil import _band_matrix, gaussian_radius

    Ws = []
    radii = []
    for s in sigmas:
        sv = float(s) / hy
        r = gaussian_radius(sv, float(truncate))
        radii.append(r)
        # the TRUE-face clamp is folded into the band matrix: rows are
        # built for the TRUE extent Y (clamp at Y-1), padded OUTPUT rows
        # replicate row Y-1 so the smoothed padded columns are EXACTLY
        # s(Y-1) — the value the stencil's edge clamp must read — and
        # padded INPUT columns get zero weight (their replicas are
        # already folded into column Y-1 by the clamp rows). Building W
        # for Yp instead made padded columns "smoothing evaluated at a
        # virtual position", which the stencil then consumed at the last
        # true column — the same true-face bug class the round-5 gate
        # caught in the sweep path (review finding; exercised by
        # test_ys_multi_unaligned_y via pad_to).
        Wt = _band_matrix(Y, sv, r)
        Wp = np.zeros((Yp, Yp), dtype=Wt.dtype)
        Wp[:Y, :Y] = Wt
        Wp[Y:, :Y] = Wt[Y - 1]
        Ws.append(jnp.asarray(Wp, nums[0].dtype))

    kernel = functools.partial(
        _features8_ys_multi_kernel, S=S, n_x=n_x, radii=tuple(radii),
        hx=hx, hy=hy, hz=hz,
    )
    in_spec = pl.BlockSpec(
        (1, Yp, Z), lambda i: (jnp.minimum(i, n_x - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, Yp, Z), lambda i: (jnp.maximum(i - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    w_spec = pl.BlockSpec(
        (Yp, Yp), lambda i: (0, 0), memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_x + 1,),
        in_specs=[in_spec] * (2 * S) + [out_spec] + [w_spec] * S,
        out_specs=[out_spec] * (8 * S),
        out_shape=[jax.ShapeDtypeStruct((X, Yp, Z), nums[0].dtype)] * (
            8 * S),
        scratch_shapes=(
            [pltpu.VMEM((1, Yp, Z), nums[0].dtype)] * S
            + [pltpu.VMEM((1, Yp, Z), nums[0].dtype)] * S
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(*nums, *dens, m, *Ws)
    if (Yp, Z) != (Y, Zin):
        outs = [o[:, :Y, :Zin] for o in outs]
    groups = tuple(tuple(outs[8 * s : 8 * s + 8]) for s in range(S))
    if stack:
        return jnp.stack([jnp.stack(g, 0) for g in groups], 0)
    return groups


# the xs-stream kernel's two input rings must fit VMEM next to the block
# pipeline and the Mosaic stack temporaries; same 44 MB calibration as
# the full sweep (the stencil/eigen tail is identical) until measured
_XS_RING_BUDGET = 44 * 1024 * 1024


# the xs kernel's x-tap ring reads grow linearly with the radius while
# the fully-staged path is radius-flat; measured crossover (r5_probe18,
# 256^3): xs wins at rx=14 (4.23 vs 4.97 ms), loses at rx=28 (5.30 vs
# 5.12) — linear interpolation puts break-even near rx ~ 25; cap at 20
# to keep only clear wins on the xs side
_XS_RX_MAX = 20


def _xs_stream_fits(sigma, spacing, shape, truncate=4.5):
    import math

    rx = max(1, math.ceil(truncate * float(sigma) / float(spacing[0])))
    Yp = -(-shape[1] // 8) * 8
    Z = -(-shape[2] // 128) * 128
    return (rx <= _XS_RX_MAX
            and 2 * (2 * rx + 4) * Yp * Z * 4 <= _XS_RING_BUDGET)


@functools.partial(
    jax.jit, static_argnames=("sigma", "spacing", "truncate",
                              "interpret", "stack")
)
def fused_features8(
    image: jax.Array,
    mask: jax.Array,
    sigma: float,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    truncate: float = 4.5,
    interpret: bool = False,
    stack: bool = True,
):
    """features8 with the post-smoothing chain fused into one Pallas pass.

    Smoothing (normalized Gaussian convolution) stays on the MXU via the
    banded einsum (already one fused XLA op per axis); everything after —
    gradient magnitude, 6-channel Hessian, eigen features, masking — is a
    single kernel instead of ~10 materialized XLA passes.

    Returns (8, X, Y, Z) channel-first when stack=True (see module
    docstring), else a tuple of 8 arrays. jnp.moveaxis(out, 0, -1) matches
    ops.features.features8.
    """
    from ife_tpu.ops.stencil import normalized_gaussian_convolution

    m = jnp.clip(mask, 0, 1)
    branch = None
    if not interpret and jax.devices()[0].platform == "tpu":
        # the same single-source branch helper the verify gate keys its
        # entries by; callers who reach here on the "sweep" branch (the
        # whole-pipeline sweep is a different entry point) get the
        # nearest form, the nc-sweep smoothing + streaming post kernel
        from ife_tpu.ops.features import features8_dispatch_branch

        branch = features8_dispatch_branch(sigma, spacing, image.shape,
                                           truncate)
    if branch == "sweep":
        # _sweep_fits does NOT imply _nc_sweep_fits at rx=1 (the nc
        # rings are 2 rows wider): re-check before taking the nc path
        from ife_tpu.ops.features import _nc_sweep_fits

        if not _nc_sweep_fits(sigma, spacing, image.shape, truncate):
            branch = ("xs_stream"
                      if _xs_stream_fits(sigma, spacing, image.shape,
                                         truncate)
                      else "einsum+post_stream")
    if branch in ("sweep", "nc_sweep+post_stream"):
        # small radii: smoothing as one line-sweep pass (3 volumes of
        # traffic) beats the 6-MXU-pass pipeline
        s = fused_normalized_conv_sweep(
            image, m.astype(image.dtype), sigma, spacing, truncate
        )
    elif branch == "xs_stream":
        # larger radii whose x rings still fit: y/z smoothing on the MXU
        # band einsums (radius-independent), then the x pass + divide +
        # feature chain in ONE streaming kernel — removes the two x-axis
        # MXU passes, the divide pass, and the smoothed volume's HBM
        # round trip vs the fully-staged path (11 volume traversals per
        # scale instead of ~18)
        from ife_tpu.ops.stencil import gaussian_smooth_axis

        mf = m.astype(image.dtype)

        def smooth_yz(v):
            v = gaussian_smooth_axis(v, 1, sigma, spacing[1], truncate)
            return gaussian_smooth_axis(v, 2, sigma, spacing[2], truncate)

        return fused_features8_xs_stream(
            smooth_yz(image * mf), smooth_yz(mf), m, sigma, spacing,
            truncate, interpret=interpret, stack=stack,
        )
    else:
        # largest radii: the MXU band-einsum path is ~radius-independent
        # (~23 ms/512^3) while the sweep/ring tap cost grows linearly
        # with the radius (r4_probe14/15) — the measured crossover is
        # rx ~ 10
        s = normalized_gaussian_convolution(
            image, m.astype(image.dtype), sigma, spacing, truncate
        )
    # streaming post kernel: no manual halo-window DMA / read amplification
    return fused_features8_post_stream(
        s, m, spacing, interpret=interpret, stack=stack
    )


@functools.partial(
    jax.jit, static_argnames=("spacing", "block", "interpret", "stack",
                              "pre_padded")
)
def fused_features8_post(
    s: jax.Array,
    m: jax.Array,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    block=(8, 128),
    interpret: bool = False,
    stack: bool = True,
    pre_padded: bool = False,
):
    """The post-smoothing features8 stage as one Pallas pass (windowed
    manual-DMA form — SUPERSEDED in dispatch by
    fused_features8_post_stream, which moves the same chain through
    Mosaic's own block pipeline with no window read amplification; this
    form remains as the interpreter-testable reference and for shapes
    where a 2D grid is preferable): smoothed volume -> [smoothed, |grad|,
    6 eigen features], masked.

    pre_padded=True: `s` already carries a radius-1 boundary layer on X and
    Y ((X+2, Y+2, Z) for an (X, Y, Z) core) — e.g. a halo-extended shard
    block from ife_tpu.parallel.halo (real neighbor slabs interior, edge
    replication at true volume faces); `m` is the (X, Y, Z) core mask.
    This is what lets the sharded path run the same kernel per shard.
    """
    if pre_padded:
        X, Y, Zin = s.shape[0] - 2, s.shape[1] - 2, s.shape[2]
    else:
        X, Y, Zin = s.shape
    # lane-tile alignment of the DMA window (see fused_hessian_eig)
    Z = Zin if interpret else -(-Zin // 128) * 128
    if Z != Zin:
        s = jnp.pad(s, ((0, 0), (0, 0), (0, Z - Zin)), mode="edge")
        m = jnp.pad(m, ((0, 0), (0, 0), (0, Z - Zin)), mode="edge")
    tx, ty = (block, block) if isinstance(block, int) else block
    bx, Xp = _pick_block(X, tx)
    by, Yp = _pick_block(Y, ty)
    wy = -(-(by + 2) // 8) * 8
    hx, hy, hz = (float(v) for v in spacing)
    if pre_padded:
        # Y-hi slack for the sublane-aligned DMA window + grid-multiple pad
        sp = jnp.pad(
            s, ((0, Xp - X), (0, (Yp - Y) + wy - by - 2), (0, 0)), mode="edge"
        )
    else:
        sp = jnp.pad(
            s, ((1, 1 + Xp - X), (1, (Yp - Y) + wy - by - 1), (0, 0)),
            mode="edge",
        )
    if (Xp, Yp) != (X, Y):
        m = jnp.pad(m, ((0, Xp - X), (0, Yp - Y), (0, 0)), mode="edge")

    # 9 VMEM block streams: 8 outputs + the mask input block
    n_buf = _pick_n_buf(bx, by, wy, Z, 9, s.dtype.itemsize)
    kernel = functools.partial(
        _features8_kernel, bx=bx, by=by, wy=wy, hx=hx, hy=hy, hz=hz,
        n_buf=n_buf,
    )
    blk_spec = pl.BlockSpec(
        (bx, by, Z), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=(Xp // bx, Yp // by),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), blk_spec],
        out_specs=[blk_spec] * 8,
        out_shape=[jax.ShapeDtypeStruct((Xp, Yp, Z), s.dtype)] * 8,
        scratch_shapes=[
            pltpu.VMEM((n_buf, bx + 2, wy, Z), s.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(sp, m)
    if (Xp, Yp, Z) != (X, Y, Zin):
        outs = [o[:X, :Y, :Zin] for o in outs]
    if stack:
        return jnp.stack(outs, axis=0)
    return tuple(outs)


@functools.partial(
    jax.jit, static_argnames=("spacing", "block", "interpret", "stack",
                              "pre_padded")
)
def fused_features8_post_stream(
    s: jax.Array,
    m: jax.Array,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    block: int = 2,
    interpret: bool = False,
    stack: bool = True,
    pre_padded: bool = False,
    x_halo=None,
):
    """Streaming-halo variant of fused_features8_post: smoothed volume +
    mask -> the 8 masked feature channels, 1D grid over x-slabs with the
    x halo carried across grid steps (see _features8_post_stream_kernel).
    Replaces the windowed post kernel on the staged features8 path and
    per shard in the sharded wrapper (the windowed kernel's manual-DMA
    overhead was the round-3 sharded wrapper's 2.3x, VERDICT Weak-3).

    pre_padded=True: `s` carries a radius-1 boundary layer on X and Y
    ((X+2, Y+2, Z) for an (X, Y, Z) core `m`) — e.g. a halo-extended
    shard block. The kernel simply treats the extended array as the
    volume (its own edge clamps then touch only the sliced-away border
    layer, whose interior neighbors are the real halo data) and the core
    is sliced from the result.

    x_halo: optional ((1, Y, Z), (1, Y, Z)) x-halo ROWS of `s` — the
    zero-copy alternative to pre_padded for 1D (x-sharded) blocks (see
    fused_hessian_eig_stream). Mutually exclusive with pre_padded.
    """
    ext_halo = x_halo is not None
    if ext_halo and pre_padded:
        raise ValueError("x_halo and pre_padded are mutually exclusive")
    if pre_padded:
        X, Y, Zin = s.shape[0] - 2, s.shape[1] - 2, s.shape[2]
        # the border layer of the mask is never kept; replicate-pad it so
        # shapes match the extended s
        m = jnp.pad(m, ((1, 1), (1, 1), (0, 0)), mode="edge")
        Xw, Yw = X + 2, Y + 2
    else:
        X, Y, Zin = s.shape
        Xw, Yw = X, Y
    Z = Zin if interpret else -(-Zin // 128) * 128
    Yp = Yw if interpret else -(-Yw // 8) * 8
    if (Yp, Z) != (Yw, Zin):
        pads = ((0, 0), (0, Yp - Yw), (0, Z - Zin))
        s = jnp.pad(s, pads, mode="edge")
        m = jnp.pad(m, pads, mode="edge")
        if ext_halo:
            x_halo = tuple(jnp.pad(h, pads, mode="edge") for h in x_halo)
    bx, Xp = _pick_block(Xw, block)
    if Xp != Xw:
        if ext_halo:
            # row X must be the hi halo row (see fused_hessian_eig_stream)
            tail = [x_halo[1]] + [s[-1:]] * (Xp - Xw - 1)
            s = jnp.concatenate([s] + tail, axis=0)
        else:
            s = jnp.pad(s, ((0, Xp - Xw), (0, 0), (0, 0)), mode="edge")
        m = jnp.pad(m, ((0, Xp - Xw), (0, 0), (0, 0)), mode="edge")
    n_x = Xp // bx
    hx, hy, hz = (float(v) for v in spacing)

    kernel = functools.partial(
        _features8_post_stream_kernel, bx=bx, hx=hx, hy=hy, hz=hz,
        n_x=n_x, ext_halo=ext_halo,
    )
    in_spec = pl.BlockSpec(
        (bx, Yp, Z), lambda i: (jnp.minimum(i, n_x - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    halo_spec = pl.BlockSpec(
        (1, Yp, Z), lambda i: (0, 0, 0), memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (bx, Yp, Z), lambda i: (jnp.maximum(i - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_x + 1,),
        # the mask block rides the OUTPUT (lagged) index map — it is
        # consumed when block i-1's features are emitted
        in_specs=[in_spec, out_spec]
        + ([halo_spec, halo_spec] if ext_halo else []),
        out_specs=[out_spec] * 8,
        out_shape=[jax.ShapeDtypeStruct((Xp, Yp, Z), s.dtype)] * 8,
        scratch_shapes=[
            pltpu.VMEM((bx, Yp, Z), s.dtype),
            pltpu.VMEM((1, Yp, Z), s.dtype),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(s, m.astype(s.dtype), *(x_halo if ext_halo else ()))
    lo = 1 if pre_padded else 0
    if (Xp, Yp, Z) != (X + lo, Y + lo, Zin) or pre_padded:
        outs = [o[lo:lo + X, lo:lo + Y, :Zin] for o in outs]
    if stack:
        return jnp.stack(outs, axis=0)
    return tuple(outs)


@functools.partial(
    jax.jit, static_argnames=("sigmas", "spacing", "truncate", "block",
                              "interpret", "stack", "pad_to")
)
def fused_features8_sweep_multi(
    image: jax.Array,
    mask: jax.Array,
    sigmas,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    truncate: float = 4.5,
    block: int = 1,
    interpret: bool = False,
    stack: bool = True,
    clamps: jax.Array | None = None,
    pad_to=None,
):
    """S scales of the full line-sweep features8 in ONE Pallas launch,
    sharing the raw image/mask input rings (see
    _features8_sweep_multi_kernel). A RECORDED NEGATIVE RESULT kept as
    exactly-tested API, dispatched by nothing: the launch-amortization
    theory it was built on measured FALSE (r5_probe23: 5.11 ms for the
    shared dual-scale pass vs 4.92 for two separate launches at 256^3 —
    launches cost ~0.1 ms and the per-scale VPU tap work, which sharing
    cannot remove, dominates; closure in docs/design.md). It remains
    the measurement vehicle for any future ladder-sharing idea.

    Returns a tuple of S 8-channel tuples (stack=False) or a stacked
    (S, 8, X, Y, Z) array.
    """
    hx, hy, hz = (float(v) for v in spacing)
    sigmas = tuple(float(s) for s in sigmas)
    taps_lists = []
    rx_list = []
    for s in sigmas:
        tx, rx = _smooth_taps(s, hx, float(truncate))
        ty, _ = _smooth_taps(s, hy, float(truncate))
        tz, _ = _smooth_taps(s, hz, float(truncate))
        taps_lists.append((tx, ty, tz))
        rx_list.append(rx)
    S = len(sigmas)
    rx_max = max(rx_list)

    X, Y, Zin = image.shape
    m = mask.astype(image.dtype)
    if pad_to is not None:
        Yp, Z = pad_to  # test hook (see fused_features8_sweep)
    else:
        Z = Zin if interpret else -(-Zin // 128) * 128
        Yp = Y if interpret else -(-Y // 8) * 8
    if (Yp, Z) != (Y, Zin):
        pads = ((0, 0), (0, Yp - Y), (0, Z - Zin))
        image = jnp.pad(image, pads, mode="edge")
        m = jnp.pad(m, pads, mode="edge")
    bx = max(1, int(block))
    Xp = -(-X // bx) * bx
    if Xp != X:
        image = jnp.pad(image, ((0, Xp - X), (0, 0), (0, 0)), mode="edge")
        m = jnp.pad(m, ((0, Xp - X), (0, 0), (0, 0)), mode="edge")
    n_blocks = Xp // bx
    L = -(-(rx_max + 1) // bx)
    R = (-(-(2 * rx_max + 2) // bx) + 2) * bx

    if clamps is None:
        clamps = jnp.asarray([0, X - 1, 0, Y - 1], jnp.int32)
    else:
        clamps = jnp.asarray(clamps, jnp.int32)

    kernel = functools.partial(
        _features8_sweep_multi_kernel, R=R, n_blocks=n_blocks, bx=bx, L=L,
        rx_list=tuple(rx_list), taps_lists=tuple(taps_lists),
        hx=hx, hy=hy, hz=hz, z_true=Zin,
    )
    in_spec = pl.BlockSpec(
        (bx, Yp, Z), lambda i: (jnp.minimum(i, n_blocks - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (bx, Yp, Z), lambda i: (jnp.maximum(i - L, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks + L,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), in_spec, in_spec],
        out_specs=[out_spec] * (8 * S),
        out_shape=[jax.ShapeDtypeStruct((Xp, Yp, Z), image.dtype)] * (
            8 * S),
        scratch_shapes=(
            [pltpu.VMEM((R, Yp, Z), image.dtype),
             pltpu.VMEM((R, Yp, Z), image.dtype)]
            + [pltpu.VMEM((bx + 2, Yp, Z), image.dtype)] * S
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(clamps, image, m)
    if (Xp, Yp, Z) != (X, Y, Zin):
        outs = [o[:X, :Y, :Zin] for o in outs]
    groups = tuple(tuple(outs[8 * s : 8 * s + 8]) for s in range(S))
    if stack:
        return jnp.stack([jnp.stack(g, 0) for g in groups], 0)
    return groups


@functools.partial(
    jax.jit, static_argnames=("sigma", "spacing", "truncate", "block",
                              "interpret", "stack", "pad_to")
)
def fused_features8_sweep(
    image: jax.Array,
    mask: jax.Array,
    sigma: float,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    truncate: float = 4.5,
    block: int = 1,
    interpret: bool = False,
    stack: bool = True,
    clamps: jax.Array | None = None,
    pad_to=None,
):
    """Line-sweep features8: the ENTIRE pipeline (separable FIR smoothing,
    normalized-convolution divide, gradient/Hessian/eigen, masking) as one
    Pallas pass that emits `block` x-rows of all 8 channels per grid step
    (block=1 measures fastest at 512^3: 19.8 vs 24.1 ms for block=2 —
    r3_batch6.txt; the multi-row variant does more ring-read/select work
    per row than it saves in per-step overhead),
    with input rows held in a VMEM ring buffer (see
    _features8_sweep_kernel). HBM traffic = read image + mask once +
    write the 8 channels — no windows, no read amplification, no
    intermediates: the op's lower bound.

    VMEM scales with the smoothing radius (2 rings of ~2*rx rows), so
    this path serves radii where the rings fit next to the block pipeline
    — on a 512^2 slice that is rx <= ~16 (sigma <= ~2.8 at 0.78 mm
    spacing); features8_auto falls back to the staged path beyond.

    Returns (8, X, Y, Z) when stack=True, else a tuple of 8 arrays;
    jnp.moveaxis(out, 0, -1) matches ops.features.features8.
    """
    hx, hy, hz = (float(v) for v in spacing)
    taps_x, rx = _smooth_taps(float(sigma), hx, float(truncate))
    taps_y, _ = _smooth_taps(float(sigma), hy, float(truncate))
    taps_z, _ = _smooth_taps(float(sigma), hz, float(truncate))

    X, Y, Zin = image.shape
    m = mask.astype(image.dtype)
    if pad_to is not None:
        # test hook: force the TPU alignment-padding path (incl. the
        # z true-face stencil clamp) under the interpreter
        Yp, Z = pad_to
    else:
        Z = Zin if interpret else -(-Zin // 128) * 128
        Yp = Y if interpret else -(-Y // 8) * 8
    if (Yp, Z) != (Y, Zin):
        pads = ((0, 0), (0, Yp - Y), (0, Z - Zin))
        image = jnp.pad(image, pads, mode="edge")
        m = jnp.pad(m, pads, mode="edge")
    bx = max(1, int(block))
    Xp = -(-X // bx) * bx
    if Xp != X:
        # edge-replicate pad: outputs for the slack rows are sliced away,
        # and the tail's clamp replica is still the true last row
        image = jnp.pad(image, ((0, Xp - X), (0, 0), (0, 0)), mode="edge")
        m = jnp.pad(m, ((0, Xp - X), (0, 0), (0, 0)), mode="edge")
    n_blocks = Xp // bx
    L = -(-(rx + 1) // bx)  # output lag in blocks
    # ring size: multiple of bx, with 2 blocks of slack beyond the tap
    # span so a seeded/old row is never overwritten before its last read
    R = (-(-(2 * rx + 2) // bx) + 2) * bx

    if clamps is None:
        # a whole volume: the true faces ARE the array faces
        clamps = jnp.asarray([0, X - 1, 0, Y - 1], jnp.int32)
    else:
        clamps = jnp.asarray(clamps, jnp.int32)

    kernel = functools.partial(
        _features8_sweep_kernel, R=R, n_blocks=n_blocks, bx=bx, L=L, rx=rx,
        taps_x=taps_x, taps_y=taps_y, taps_z=taps_z, hx=hx, hy=hy, hz=hz,
        z_true=Zin,
    )
    in_spec = pl.BlockSpec(
        (bx, Yp, Z), lambda i: (jnp.minimum(i, n_blocks - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (bx, Yp, Z), lambda i: (jnp.maximum(i - L, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks + L,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), in_spec, in_spec],
        out_specs=[out_spec] * 8,
        out_shape=[jax.ShapeDtypeStruct((Xp, Yp, Z), image.dtype)] * 8,
        scratch_shapes=[
            pltpu.VMEM((R, Yp, Z), image.dtype),
            pltpu.VMEM((R, Yp, Z), image.dtype),
            pltpu.VMEM((bx + 2, Yp, Z), image.dtype),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(clamps, image, m)
    if (Xp, Yp, Z) != (X, Y, Zin):
        outs = [o[:X, :Y, :Zin] for o in outs]
    if stack:
        return jnp.stack(outs, axis=0)
    return tuple(outs)


@functools.partial(
    jax.jit, static_argnames=("sigma", "spacing", "truncate", "block",
                              "interpret", "stack", "variant", "n_buf")
)
def fused_features8_tap(
    image: jax.Array,
    mask: jax.Array,
    sigma: float,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    truncate: float = 4.5,
    block=(8, 128),
    interpret: bool = False,
    stack: bool = True,
    variant: str = "concat",
    n_buf: int | None = None,
):
    """SUPERSEDED by fused_features8_sweep (same full fusion, ring-buffer
    streaming instead of halo windows: 19.1 vs 31.1 ms at 512^3 sigma=1.0
    — docs/design.md ladder table). Kept for the record (measured and
    on-chip-verified); dispatched by nothing. KNOWN LIMITATION shared
    with its era: the z lane-alignment padding is smoothed in-kernel, so
    for Z % 128 != 0 the stencil's last true z plane reads
    smoothing-at-virtual-position instead of the clamp (the round-5
    true-face bug class, fixed in the DISPATCHED kernels via
    _true_face_zshift; deliberately not back-ported to shelf-ware).

    features8 in ONE Pallas pass: the whole separable FIR smoothing
    (all three axes), the normalized-convolution divide, and the
    gradient/Hessian/eigen/mask chain, straight from the raw image + mask.

    HBM traffic = the two halo-amplified input windows + the mask + the 8
    output channels — no smoothing intermediates at all. vs the staged
    path this removes the six MXU smoothing passes, the divide pass, and
    the smoothed volume's round trip (the staged path's XLA einsum passes
    measure ~170 GB/s effective vs ~350 for the Pallas kernels, so moving
    that traffic INTO the kernel wins twice). In-kernel smoothing is
    strictly VPU tap FMAs — see _features8_tap_kernel for why no MXU.

    Intended for the small/medium radii of the product's scale range; the
    halo window grows with radius, so features8_auto falls back to the
    staged path when the x window would more than ~3x-amplify the reads.

    Semantics: reference ImageToEmphysemaFeaturesFilter.hxx:14-55 end to
    end. Returns (8, X, Y, Z) when stack=True, else a tuple of 8 arrays;
    jnp.moveaxis(out, 0, -1) matches ops.features.features8.
    """
    hx, hy, hz = (float(v) for v in spacing)
    taps_x, rx = _smooth_taps(float(sigma), hx, float(truncate))
    taps_y, ry = _smooth_taps(float(sigma), hy, float(truncate))
    taps_z, rz = _smooth_taps(float(sigma), hz, float(truncate))
    del rz  # z is full-extent in the window; no halo needed

    X, Y, Zin = image.shape
    mf = jnp.clip(mask, 0, 1).astype(image.dtype)
    num = image * mf
    den = mf

    # lane-tile alignment (see fused_hessian_eig); the padded planes
    # replicate the last true plane, which is exactly what the in-kernel
    # clamped z taps would read at the true edge
    Z = Zin if interpret else -(-Zin // 128) * 128
    if Z != Zin:
        num = jnp.pad(num, ((0, 0), (0, 0), (0, Z - Zin)), mode="edge")
        den = jnp.pad(den, ((0, 0), (0, 0), (0, Z - Zin)), mode="edge")
    tx, ty = (block, block) if isinstance(block, int) else block
    bx, Xp = _pick_block(X, tx)
    by, Yp = _pick_block(Y, ty)
    yk = -(-(by + 2) // 8) * 8          # smoothed-block column extent
    wyw = -(-(yk + 2 * ry) // 8) * 8    # y window: yk cols + smoothing halo
    nxw = bx + 2 + 2 * rx               # x window: stencil + smoothing halo

    # x halo rx+1 per side (+ grid slack high), y halo ry+1 (+ alignment
    # slack): window (i, j) reads padded rows [i*bx, i*bx+nxw), padded
    # cols [j*by, j*by+wyw). No separate mask input — the kernel reads the
    # mask out of the denominator window's core.
    pad_x = (rx + 1, rx + 1 + (Xp - X))
    pad_y = (ry + 1, (Yp - Y) + wyw - by - ry - 1)
    num = jnp.pad(num, (pad_x, pad_y, (0, 0)), mode="edge")
    den = jnp.pad(den, (pad_x, pad_y, (0, 0)), mode="edge")

    # VMEM: 8 double-buffered outputs + 2 windows x n_buf + the two s
    # scratches + ~4 window-sized compiler temporaries
    item = image.dtype.itemsize
    if n_buf is None:
        est2 = item * Z * (
            2 * 8 * bx * by + (2 * 2 + 4) * nxw * wyw + 2 * (bx + 2) * yk
        )
        n_buf = 2 if est2 <= int(0.8 * _VMEM_LIMIT) else 1

    kernel = functools.partial(
        _features8_tap_kernel, bx=bx, by=by, yk=yk, nxw=nxw, wyw=wyw,
        rx=rx, ry=ry, x_true=X, y_true=Y, taps_x=taps_x, taps_y=taps_y,
        taps_z=taps_z, hx=hx, hy=hy, hz=hz, n_buf=n_buf, zshift=variant,
    )
    blk_spec = pl.BlockSpec(
        (bx, by, Z), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=(Xp // bx, Yp // by),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[blk_spec] * 8,
        out_shape=[jax.ShapeDtypeStruct((Xp, Yp, Z), image.dtype)] * 8,
        scratch_shapes=[
            pltpu.VMEM((n_buf, nxw, wyw, Z), image.dtype),
            pltpu.VMEM((n_buf, nxw, wyw, Z), image.dtype),
            pltpu.VMEM((bx + 2, yk, Z), image.dtype),
            pltpu.VMEM((bx + 2, yk, Z), image.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(num, den)
    if (Xp, Yp, Z) != (X, Y, Zin):
        outs = [o[:X, :Y, :Zin] for o in outs]
    if stack:
        return jnp.stack(outs, axis=0)
    return tuple(outs)


@functools.partial(
    jax.jit, static_argnames=("sigma", "spacing", "truncate", "block",
                              "interpret", "stack", "variant")
)
def fused_features8_xs(
    image: jax.Array,
    mask: jax.Array,
    sigma: float,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    truncate: float = 4.5,
    block=(8, 128),
    interpret: bool = False,
    stack: bool = True,
    variant: str = "concat",
):
    """SUPERSEDED by fused_features8_sweep (docs/design.md ladder table:
    44.3 ms vs the sweep's 19.1 at 512^3 sigma=1.0). Kept for the record;
    dispatched by nothing. Shares the superseded-era z-padding
    limitation noted on fused_features8_tap.

    features8 with smoothing split across its cheapest units: y and z
    Gaussian passes ride the XLA blocked-band MXU einsums (2 passes each
    for numerator and denominator), while the x pass, the normalized-
    convolution divide, and the whole gradient/Hessian/eigen/mask chain
    fuse into ONE Pallas kernel (_features8_xs_kernel).

    vs fused_features8 (the fully-staged path) this removes per scale:
    the two x-axis MXU passes, the divide pass, and the smoothed volume's
    full HBM round trip (write + halo-amplified read) — the largest
    single chunk of the staged path's traffic.

    vs the retired fused_features8_full (everything in one kernel) the
    in-kernel work is VPU-only (leading-axis tap FMAs + divide): no
    in-kernel matmuls, no ys scratch — the pieces implicated in that
    kernel's on-chip mis-lowering. Everything downstream of the divide is
    the byte-identical code path of the proven _features8_kernel.

    Semantics: reference ImageToEmphysemaFeaturesFilter.hxx:14-55 end to
    end. Returns (8, X, Y, Z) when stack=True, else a tuple of 8 arrays;
    jnp.moveaxis(out, 0, -1) matches ops.features.features8.
    """
    from ife_tpu.ops.stencil import gaussian_smooth_axis

    hx, hy, hz = (float(v) for v in spacing)
    taps_x, rx = _smooth_taps(float(sigma), hx, float(truncate))
    Hx = rx + 1  # smoothing halo + stencil halo

    X, Y, Zin = image.shape
    m = jnp.clip(mask, 0, 1)
    mf = m.astype(image.dtype)

    def smooth_yz(v):
        v = gaussian_smooth_axis(v, 1, sigma, hy, truncate)
        return gaussian_smooth_axis(v, 2, sigma, hz, truncate)

    num = smooth_yz(image * mf)
    den = smooth_yz(mf)

    # lane-tile alignment of the DMA window (see fused_hessian_eig);
    # edge-pad AFTER smoothing so the pad plane replicates the smoothed
    # boundary exactly (what the z stencil's clamp wants to see)
    Z = Zin if interpret else -(-Zin // 128) * 128
    if Z != Zin:
        num = jnp.pad(num, ((0, 0), (0, 0), (0, Z - Zin)), mode="edge")
        den = jnp.pad(den, ((0, 0), (0, 0), (0, Z - Zin)), mode="edge")
        m = jnp.pad(m, ((0, 0), (0, 0), (0, Z - Zin)), mode="edge")
    tx, ty = (block, block) if isinstance(block, int) else block
    bx, Xp = _pick_block(X, tx)
    by, Yp = _pick_block(Y, ty)
    wy = -(-(by + 2) // 8) * 8  # sublane-aligned DMA window extent
    nxw = bx + 2 + 2 * rx       # x window: stencil halo + smoothing taps

    # x halo Hx per side (+ grid slack high), y halo 1 (+ alignment slack):
    # the in-kernel x-pass is per-column, so edge-replicated columns stay
    # exact replicas and the y stencil clamp is exact; the x halo rows are
    # re-clamped in-kernel by global row index (see kernel docstring).
    pad_x = (Hx, Hx + (Xp - X))
    pad_y = (1, (Yp - Y) + wy - by - 1)
    num = jnp.pad(num, (pad_x, pad_y, (0, 0)), mode="edge")
    den = jnp.pad(den, (pad_x, pad_y, (0, 0)), mode="edge")
    if (Xp, Yp) != (X, Y):
        m = jnp.pad(m, ((0, Xp - X), (0, Yp - Y), (0, 0)), mode="edge")

    # VMEM: 8 double-buffered outputs + mask blocks + 2 windows x n_buf +
    # the two s-materialization scratches; the DMA barrier (see kernel)
    # bounds compiler temporaries to ~4 window-sized values
    item = image.dtype.itemsize
    est = item * Z * (
        2 * 9 * bx * by + (2 * 2 + 4) * nxw * wy + 2 * (bx + 2) * wy
    )
    n_buf = 2 if est <= int(0.8 * _VMEM_LIMIT) else 1

    kernel = functools.partial(
        _features8_xs_kernel, bx=bx, by=by, wy=wy, nxw=nxw, x_true=X,
        taps_x=taps_x, hx=hx, hy=hy, hz=hz, n_buf=n_buf, zshift=variant,
    )
    blk_spec = pl.BlockSpec(
        (bx, by, Z), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=(Xp // bx, Yp // by),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            blk_spec,
        ],
        out_specs=[blk_spec] * 8,
        out_shape=[jax.ShapeDtypeStruct((Xp, Yp, Z), image.dtype)] * 8,
        scratch_shapes=[
            pltpu.VMEM((n_buf, nxw, wy, Z), image.dtype),
            pltpu.VMEM((n_buf, nxw, wy, Z), image.dtype),
            pltpu.VMEM((bx + 2, wy, Z), image.dtype),
            pltpu.VMEM((bx + 2, wy, Z), image.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(num, den, m)
    if (Xp, Yp, Z) != (X, Y, Zin):
        outs = [o[:X, :Y, :Zin] for o in outs]
    if stack:
        return jnp.stack(outs, axis=0)
    return tuple(outs)
