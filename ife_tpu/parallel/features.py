"""Sharded (multi-device) feature ops: the single-device ops of
ife_tpu.ops re-expressed over a block-sharded voxel grid.

Design (new — the reference is single-node, SURVEY.md §2.4):
  * the volume is block-sharded along X (1D mesh) or X,Y (2D mesh); Z — the
    TPU lane axis — stays local;
  * Gaussian smoothing along a sharded axis = radius-R halo exchange + a
    rectangular band-matrix contraction producing exactly the kept region
    (the halo's edge replication reproduces ITK's ZeroFluxNeumann clamp, so
    results match the single-device banded contraction);
  * all finite differences after smoothing need radius 1 per axis — one
    more halo exchange of the smoothed field, then every derivative
    (including the cascaded cross terms Dx→Dy etc., reference
    Hessian3DImageFilter.hxx:31-59) is local, consuming the halo exactly
    once per axis;
  * eigen features / masking are elementwise-local;
  * per-block results compose into the same (X, Y, Z, 8) global array as
    ops.features.features8 — parity is tested on the 8-device CPU mesh.
"""
from __future__ import annotations

import functools
import math
from typing import Dict, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ife_tpu.ops import stencil
from ife_tpu.ops.eigen import eigenvalue_features
from ife_tpu.parallel.halo import halo_exchange, _slab
from ife_tpu.parallel.mesh import volume_pspec


# ---------------------------------------------------------------------------
# banded Gaussian on an extended block
# ---------------------------------------------------------------------------

def _smooth_axis_block(
    x: jnp.ndarray, axis: int, axis_name: str, sigma: float, spacing: float,
    truncate: float,
) -> jnp.ndarray:
    """Gaussian along a SHARDED axis: halo exchange + VALID convolution —
    the halo (real neighbor slabs / edge replication at true edges) plays
    exactly the role of stencil.gaussian_smooth_axis's edge pad, so results
    match the single-device op."""
    if sigma <= 0:
        return x
    sigma_vox = float(sigma) / float(spacing)
    radius = stencil.gaussian_radius(sigma_vox, truncate)
    x_ext = halo_exchange(x, axis, radius, axis_name)
    return stencil.convolve_valid_axis(x_ext, axis, sigma_vox, radius)


# ---------------------------------------------------------------------------
# finite differences on halo-extended blocks
# ---------------------------------------------------------------------------

Exts = Dict[int, int]  # axis -> current halo width carried by the array


def _d(arr: jnp.ndarray, exts: Exts, axis: int, order: int, h: float
       ) -> Tuple[jnp.ndarray, Exts]:
    """Central difference along `axis`. Consumes the axis's halo level if it
    has one; otherwise ZeroFluxNeumann edge padding (correct only for
    unsharded axes / true edges — callers guarantee that)."""
    if exts.get(axis, 0) > 0:
        n_out = arr.shape[axis] - 2
        fm = _slab(arr, axis, 0, n_out)
        f0 = _slab(arr, axis, 1, n_out)
        fp = _slab(arr, axis, 2, n_out)
        # same f64-folded reciprocal constants as stencil.derivative so the
        # sharded and single-device paths agree to the ulp
        hf = float(h)
        if order == 1:
            out = (fp - fm) * jnp.asarray(1.0 / (2.0 * hf), arr.dtype)
        else:
            out = (fp - 2 * f0 + fm) * jnp.asarray(1.0 / (hf * hf), arr.dtype)
        new = dict(exts)
        new.pop(axis)
        return out, new
    return stencil.derivative(arr, axis, order, h), dict(exts)


def _crop(arr: jnp.ndarray, exts: Exts) -> jnp.ndarray:
    """Drop any remaining halo extensions, yielding the kept block."""
    for axis, hh in exts.items():
        if hh > 0:
            arr = _slab(arr, axis, hh, arr.shape[axis] - 2 * hh)
    return arr


def _grad_hessian_block(
    s: jnp.ndarray, sharded_axes: Dict[int, str], spacing: Sequence[float]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(gradient magnitude, 6-channel Hessian) of a block, matching
    stencil.gradient_magnitude / stencil.hessian globally."""
    E = s
    exts: Exts = {}
    for axis, name in sharded_axes.items():
        E = halo_exchange(E, axis, 1, name)
        exts[axis] = 1

    def D(arr, ex, axis, order):
        return _d(arr, ex, axis, order, spacing[axis])

    gs = []
    for axis in range(3):
        g, rem = D(E, exts, axis, 1)
        gs.append(_crop(g, rem))
    gm = jnp.sqrt(gs[0] * gs[0] + gs[1] * gs[1] + gs[2] * gs[2])

    dxx, rem = D(E, exts, 0, 2)
    dxx = _crop(dxx, rem)
    dyy, rem = D(E, exts, 1, 2)
    dyy = _crop(dyy, rem)
    dzz, rem = D(E, exts, 2, 2)
    dzz = _crop(dzz, rem)

    dx, ex1 = D(E, exts, 0, 1)
    dxy, rem = D(dx, ex1, 1, 1)
    dxy = _crop(dxy, rem)
    dxz, rem = D(dx, ex1, 2, 1)
    dxz = _crop(dxz, rem)
    dy, ex2 = D(E, exts, 1, 1)
    dyz, rem = D(dy, ex2, 2, 1)
    dyz = _crop(dyz, rem)

    H = jnp.stack([dxx, dxy, dxz, dyy, dyz, dzz], axis=-1)
    return gm, H


def _halo_or_edge_pad(arr: jnp.ndarray, sharded_axes: Dict[int, str],
                      radius=1) -> jnp.ndarray:
    """Extend X and Y by `radius` (an int or per-axis (rx, ry)): ppermute
    halos on sharded axes (true faces edge-replicated inside
    halo_exchange), edge pad on local ones — exactly the boundary layer
    the pre_padded fused kernels consume."""
    radii = (radius, radius) if isinstance(radius, int) else radius
    for axis in (0, 1):
        r = radii[axis]
        if r <= 0:
            continue
        if axis in sharded_axes:
            arr = halo_exchange(arr, axis, r, sharded_axes[axis])
        else:
            arr = stencil._edge_pad(arr, axis, r, r)
    return arr


def _features8_block(
    img: jnp.ndarray,
    msk: jnp.ndarray,
    sigma: float,
    spacing: Sequence[float],
    truncate: float,
    sharded_axes: Dict[int, str],
    use_fused: bool = False,
) -> jnp.ndarray:
    m = jnp.clip(msk, 0, 1)
    mf = m.astype(img.dtype)

    # NOTE: a fully-fused per-shard kernel (fused_features8_full, all
    # smoothing inside the kernel via in-kernel MXU matmuls) was built,
    # measured no faster than the staged path, produced wrong on-chip
    # derivative channels (Mosaic lowering fault), and was deleted in
    # round 3 — negative result recorded in docs/design.md. The staged
    # per-shard path below is the verified product path.

    # numerator and denominator smoothed separately (channel-stacking
    # measures ~2x slower on TPU — see normalized_gaussian_convolution)
    def smooth(vol):
        for axis in range(3):
            if axis in sharded_axes:
                vol = _smooth_axis_block(
                    vol, axis, sharded_axes[axis], sigma, spacing[axis],
                    truncate,
                )
            else:
                vol = stencil.gaussian_smooth_axis(
                    vol, axis, sigma, spacing[axis], truncate
                )
        return vol

    s = smooth(img * mf) / smooth(mf)

    if use_fused:
        # per-shard STREAMING Pallas kernel (no manual window DMA — the
        # windowed kernel's DMA overhead was the round-3 sharded
        # wrapper's 2.3x)
        from ife_tpu.kernels.fused import fused_features8_post_stream

        if set(sharded_axes) <= {0}:
            # 1D x-sharded mesh: zero-copy halo ROWS of the smoothed
            # field instead of materializing an extended block
            if 0 in sharded_axes:
                from ife_tpu.parallel.halo import halo_slabs

                halo = halo_slabs(s, 0, 1, sharded_axes[0])
            else:
                halo = None
            return fused_features8_post_stream(
                s, m, tuple(spacing), stack=False, x_halo=halo
            )
        s_ext = _halo_or_edge_pad(s, sharded_axes)
        return fused_features8_post_stream(
            s_ext, m, tuple(spacing), pre_padded=True, stack=False
        )

    gm, H = _grad_hessian_block(s, sharded_axes, spacing)
    eig = eigenvalue_features(H)
    inside = m != 0
    zero = jnp.zeros((), img.dtype)
    chans = (s, gm) + tuple(eig[..., k] for k in range(6))
    return tuple(jnp.where(inside, c, zero) for c in chans)


# ---------------------------------------------------------------------------
# public sharded ops
# ---------------------------------------------------------------------------

def _sharded_axis_map(mesh: Mesh) -> Dict[int, str]:
    return {i: name for i, name in enumerate(mesh.axis_names)}


def _resolve_use_fused(use_fused) -> bool:
    """None -> fused Pallas per-shard kernels on TPU, XLA elsewhere (the
    interpreter-free fused path cannot run on a CPU mesh)."""
    if use_fused is None:
        return jax.devices()[0].platform == "tpu"
    return bool(use_fused)


def _features8_block_sweep(
    img: jnp.ndarray,
    msk: jnp.ndarray,
    sigma: float,
    spacing: Sequence[float],
    truncate: float,
    sharded_axes: Dict[int, str],
    radii: Tuple[int, int],
    axis_sizes: Dict[int, int],
) -> Tuple[jnp.ndarray, ...]:
    """features8 of a shard via the full line-sweep kernel: exchange a
    (smoothing radius + 1)-deep halo on the sharded axes, run
    fused_features8_sweep on the extended block, keep the core.

    SMOOTHING composes exactly through the halo (real neighbor data
    interior; edge replication at true faces IS clamp smoothing). The
    STENCIL does not: at a true volume face its phantom must clamp to
    the SMOOTHED field (s(-1) := s(0)), which is NOT the smoothing of
    the replicated raw rows the halo holds there — the round-5 verify
    gate measured 35-50% error on the derivative channels in the
    outermost layers before this was fixed (r5_probe22). The kernel
    therefore takes DYNAMIC clamp rows: the kept core's faces on
    true-volume sides (axis_index 0 / n-1), +-2^30 sentinels on interior
    shard boundaries where the halo data is real."""
    from ife_tpu.kernels.fused import fused_features8_sweep

    core = img.shape
    lo = [0, 0]
    for axis in (0, 1):
        if axis in sharded_axes:
            r = radii[axis] + 1
            img = halo_exchange(img, axis, r, sharded_axes[axis])
            msk = halo_exchange(msk, axis, r, sharded_axes[axis])
            lo[axis] = r
    big = jnp.int32(1 << 30)
    cl = []
    for axis in (0, 1):
        if axis in sharded_axes:
            idx = jax.lax.axis_index(sharded_axes[axis])
            n_sh = axis_sizes[axis]
            cl.append(jnp.where(idx == 0, jnp.int32(lo[axis]), -big))
            cl.append(jnp.where(idx == n_sh - 1,
                                jnp.int32(lo[axis] + core[axis] - 1), big))
        else:
            cl.append(jnp.int32(0))
            cl.append(jnp.int32(core[axis] - 1))
    out = fused_features8_sweep(
        img, msk, float(sigma), tuple(spacing), float(truncate),
        stack=False, clamps=jnp.stack(cl),
    )
    return tuple(
        o[lo[0]:lo[0] + core[0], lo[1]:lo[1] + core[1], :] for o in out
    )


def _sweep_block_plan(shape, mesh, sigma, spacing, truncate):
    """(fits, radii): whether the per-shard halo-extended block still fits
    the sweep kernel's VMEM rings, and the smoothing radii (rx, ry)."""
    import math

    from ife_tpu.ops.features import _sweep_fits

    rx = max(1, math.ceil(truncate * float(sigma) / float(spacing[0])))
    ry = max(1, math.ceil(truncate * float(sigma) / float(spacing[1])))
    local = list(shape)
    for i, n in enumerate(mesh.devices.shape):
        local[i] = local[i] // n + 2 * ((rx if i == 0 else ry) + 1)
    return _sweep_fits(sigma, spacing, tuple(local), truncate), (rx, ry)


@functools.lru_cache(maxsize=256)
def _features8_fn(mesh: Mesh, shape, sigma: float, spacing, truncate: float,
                  fused: bool):
    """Cached jitted shard_map per (mesh, global shape, scale, fused):
    rebuilding the wrapper per call retraced + recompiled the program
    per invocation — ruinous for multi-image / multi-scale products
    (round-4 finding on the 512^3 bin-edges CLI)."""
    pspec = volume_pspec(mesh)
    saxes = _sharded_axis_map(mesh)
    if fused:
        from ife_tpu.ops.features import _sweep_rx_ok

        fits, radii = _sweep_block_plan(shape, mesh, sigma, spacing,
                                        truncate)
        # same crossover as features8_auto: past rx ~10 the staged
        # MXU-smoothing path beats the sweep (r4_probe14/15)
        fits = fits and _sweep_rx_ok(sigma, spacing, truncate)
    else:
        fits = False
    if fused and fits:
        sizes = {i: int(n) for i, n in enumerate(mesh.devices.shape)}
        block = functools.partial(
            _features8_block_sweep,
            sigma=sigma, spacing=spacing, truncate=truncate,
            sharded_axes=saxes, radii=radii, axis_sizes=sizes,
        )
    else:
        block = functools.partial(
            _features8_block,
            sigma=sigma, spacing=spacing, truncate=truncate,
            sharded_axes=saxes, use_fused=fused,
        )

    return jax.jit(shard_map(
        block,
        mesh=mesh,
        in_specs=(pspec, pspec),
        out_specs=(pspec,) * 8,
        # pallas_call's ShapeDtypeStruct outputs carry no vma annotation;
        # the body's collectives are hand-placed, so skip the vma check
        check_vma=False,
    ))


def sharded_features8(
    image: jax.Array,
    mask: jax.Array,
    sigma: float,
    mesh: Mesh,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    truncate: float = 4.5,
    use_fused=None,
    stack: bool = True,
) -> jax.Array:
    """features8 over a block-sharded volume. Returns (X, Y, Z, 8) sharded
    like the input (stack=True), or a tuple of 8 sharded (X, Y, Z) arrays
    (stack=False — no channel-last relayout; preferred when consumers read
    channels independently, e.g. the histogram pipelines)."""
    fn = _features8_fn(
        mesh, tuple(image.shape), float(sigma),
        tuple(float(v) for v in spacing), float(truncate),
        _resolve_use_fused(use_fused),
    )
    out = fn(image, mask)
    if stack:
        return jnp.stack(out, axis=-1)
    return out


@functools.lru_cache(maxsize=64)
def _hessian_eig_fn(mesh: Mesh, spc, fused: bool):
    """Cached jitted shard_map (see _features8_fn)."""
    pspec = volume_pspec(mesh)
    saxes = _sharded_axis_map(mesh)

    def block(img):
        if fused:
            from ife_tpu.kernels.fused import fused_hessian_eig_stream

            if set(saxes) <= {0}:
                # 1D (x-sharded) mesh: ZERO-COPY halo — the two neighbor
                # ROWS ride into the stream kernel as separate inputs
                # (x_halo), no halo-extended materialization of the block
                # (~3 ms of pure copy at 512^3; y edges are true volume
                # edges handled by the kernel's own clamp)
                from ife_tpu.parallel.halo import halo_slabs

                if 0 in saxes:
                    lo, hi = halo_slabs(img, 0, 1, saxes[0])
                    halo = (lo, hi)
                else:
                    halo = None  # single block: kernel clamps = edges
                return fused_hessian_eig_stream(
                    img, spc, block=2, stack=False, x_halo=halo)
            # 2D mesh: streaming kernel on the halo-extended block (the
            # kernel's own edge clamps touch only the sliced-away border
            # layer, whose inward neighbors are real halo data)
            core = img.shape
            ext = _halo_or_edge_pad(img, saxes)
            out = fused_hessian_eig_stream(ext, spc, block=2, stack=False)
            return tuple(o[1:1 + core[0], 1:1 + core[1], :] for o in out)
        _, H = _grad_hessian_block(img, saxes, spc)
        e = eigenvalue_features(H)
        return tuple(e[..., k] for k in range(6))

    return jax.jit(shard_map(block, mesh=mesh, in_specs=(pspec,),
                             out_specs=(pspec,) * 6, check_vma=False))


def sharded_hessian_eig(
    image: jax.Array,
    mesh: Mesh,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    use_fused=None,
    stack: bool = True,
) -> jax.Array:
    """Hessian -> 6 eigen features of a sharded raw volume: the scaling
    benchmark path (BASELINE.md configs). Returns (X, Y, Z, 6) when
    stack=True, else a tuple of 6 sharded (X, Y, Z) arrays (no
    channel-last relayout — a size-6 trailing stack lands on the TPU lane
    axis and costs ~2x the kernel pass itself, CLAUDE.md)."""
    fn = _hessian_eig_fn(mesh, tuple(float(v) for v in spacing),
                         _resolve_use_fused(use_fused))
    out = fn(image)
    if stack:
        return jnp.stack(out, axis=-1)
    return out


def features8_sharded_auto(
    image,
    mask,
    sigma: float,
    mesh: Mesh,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    truncate: float = 4.5,
) -> jax.Array:
    """sharded_features8 for arbitrary volume sizes: edge-pads to the mesh
    grid (exactly composing with ZeroFluxNeumann — see pad_to_mesh), runs
    the sharded op, crops back. Returns the unsharded-shape result."""
    from ife_tpu.parallel.mesh import crop_from_mesh, pad_to_mesh, shard_volume

    img_p, orig = pad_to_mesh(jnp.asarray(image), mesh)
    msk_p, _ = pad_to_mesh(jnp.asarray(mask), mesh)
    out = sharded_features8(
        shard_volume(img_p, mesh), shard_volume(msk_p, mesh),
        sigma, mesh, spacing, truncate,
    )
    return crop_from_mesh(out, orig)


def sharded_multiscale_features(
    image: jax.Array,
    mask: jax.Array,
    sigmas: Sequence[float],
    mesh: Mesh,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    truncate: float = 4.5,
) -> jax.Array:
    """Stacked scales, (X, Y, Z, n_scales, 8), computed fully on-mesh."""
    per = [
        sharded_features8(image, mask, float(s), mesh, spacing, truncate)
        for s in sigmas
    ]
    return jnp.stack(per, axis=-2)
