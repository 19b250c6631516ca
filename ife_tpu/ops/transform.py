"""Whole-image transform ops backing the utility tools.

Reference analogs (SURVEY.md §2.2): MaskedImageFilter, ExtractMaskedRegion,
ExtractBoundingBox, PadImage, Resample, ExtractSlices, ExtractWindow.
Each op is a pure array function; geometry metadata is handled by callers
via the Volume container.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ife_tpu.core.volume import Volume


def mask_image(img: jnp.ndarray, mask: jnp.ndarray, outside=0.0) -> jnp.ndarray:
    """out = img where mask != 0 else outside
    (reference tools/MaskedImageFilter.cxx:86-105)."""
    return jnp.where(mask != 0, img, jnp.asarray(outside, img.dtype))


def relabel_mask(
    mask: jnp.ndarray, include: Sequence[int], inside=1, outside=0
) -> jnp.ndarray:
    """values in `include` -> inside, else outside (reference
    tools/ExtractMaskedRegion.cxx:20-72 MembershipFunctor)."""
    inc = jnp.asarray(sorted(int(v) for v in include))
    member = jnp.isin(mask, inc)
    return jnp.where(member, jnp.asarray(inside, mask.dtype), jnp.asarray(outside, mask.dtype))


def bounding_box(mask: np.ndarray) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """(start, size) of the mask's axis-aligned bounding box (reference
    tools/ExtractBoundingBox.cxx:93-122, ImageMaskSpatialObject)."""
    m = np.asarray(mask) != 0
    if not m.any():
        raise ValueError("mask has no foreground voxels")
    start, size = [], []
    for d in range(m.ndim):
        axes = tuple(a for a in range(m.ndim) if a != d)
        proj = m.any(axis=axes)
        idx = np.nonzero(proj)[0]
        start.append(int(idx[0]))
        size.append(int(idx[-1] - idx[0] + 1))
    return tuple(start), tuple(size)


def crop_to_bounding_box(vol: Volume, mask: np.ndarray) -> Volume:
    start, size = bounding_box(mask)
    return vol.crop(start, size)


def pad_to_size_2d(
    img: np.ndarray, target: Sequence[int], value=0.0
) -> np.ndarray:
    """Centered constant pad of a 2D image to `target` (reference
    tools/PadImage.cxx:60-76). Asymmetric remainder goes to the high side."""
    out_shape = tuple(int(t) for t in target)
    pads = []
    for d in range(2):
        extra = out_shape[d] - img.shape[d]
        if extra < 0:
            raise ValueError(
                f"target {out_shape} smaller than image {img.shape} on axis {d}"
            )
        pads.append((extra // 2, extra - extra // 2))
    return np.pad(img, pads, mode="constant", constant_values=value)


def intensity_window(
    img: jnp.ndarray, level: float = -500.0, width: float = 1500.0
) -> jnp.ndarray:
    """Window/level to uint8 (reference tools/ExtractWindow.cxx:36-40,
    177-195 — IntensityWindowingImageFilter defaults level -500 width 1500,
    output [0, 255])."""
    lo = level - width / 2.0
    hi = level + width / 2.0
    y = (img - lo) / (hi - lo) * 255.0
    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)


def resample_to_spacing_2d(
    img: jnp.ndarray,
    spacing: Sequence[float],
    out_spacing: float = 0.25,
    order: int = 3,
) -> jnp.ndarray:
    """Resample a 2D image to isotropic `out_spacing`, nearest
    extrapolation at edges.

    Semantics target: reference tools/ExtractWindow.cxx:112-161 (0.25 mm
    isotropic, itk::BSplineInterpolateImageFunction order 3 +
    NearestNeighborExtrapolate; output size via ceil, :119-122; the mask
    path uses nearest-neighbor, :230-232 -> order=0). order=3 (default)
    matches the reference: cubic B-spline prefilter + evaluation via
    scipy on the host — this is a CLI utility path, not device-hot.
    order<=1 keeps the fully-fused XLA path.
    """
    in_shape = img.shape
    out_shape = tuple(
        int(math.ceil(in_shape[d] * spacing[d] / out_spacing))
        for d in range(2)
    )
    coords = [
        (jnp.arange(out_shape[d]) * out_spacing) / spacing[d] for d in range(2)
    ]
    if order > 1:
        from scipy import ndimage as _ndi

        grid = np.meshgrid(*(np.asarray(c) for c in coords), indexing="ij")
        out = _ndi.map_coordinates(
            np.asarray(img, dtype=np.float32), grid, order=order,
            mode="nearest",
        )
        return jnp.asarray(out)
    grid = jnp.meshgrid(*coords, indexing="ij")
    if order == 0:
        grid = [jnp.round(g) for g in grid]
    return jax.scipy.ndimage.map_coordinates(
        img.astype(jnp.float32), grid, order=min(order, 1), mode="nearest"
    )


def resample_to_grid(
    source: Volume, target: Volume, order: int = 1, default_value: float = 0.0
) -> Volume:
    """Resample `source` onto `target`'s voxel grid, aligning by physical
    origin/spacing — a translation transform from the origin difference
    (reference tools/Resample.cxx:83-103)."""
    coords = []
    for d in range(3):
        phys = target.origin[d] + target.spacing[d] * jnp.arange(target.shape[d])
        coords.append((phys - source.origin[d]) / source.spacing[d])
    grid = jnp.meshgrid(*coords, indexing="ij")
    data = jax.scipy.ndimage.map_coordinates(
        source.data.astype(jnp.float32), grid, order=order,
        mode="constant", cval=default_value,
    )
    return Volume(data, spacing=target.spacing, origin=target.origin)


def slice_indices(
    n: int,
    indices: Sequence[int] = (),
    fractions: Sequence[float] = (),
    window: int = 0,
    stride: int = 1,
) -> List[int]:
    """Expand slice selections: explicit indices and/or fractional positions,
    each optionally expanded to +/- window neighbors with stride (reference
    tools/ExtractSlices.cxx:167-205)."""
    base = [int(i) for i in indices]
    base += [int(round(f * (n - 1))) for f in fractions]
    out = set()
    for b in base:
        for k in range(-window, window + 1):
            idx = b + k * stride
            if 0 <= idx < n:
                out.add(idx)
    # reference sorts + dedups (tools/ExtractSlices.cxx:200-203)
    return sorted(out)


def extract_slice(vol: np.ndarray, axis: int, index: int, flip: bool = True) -> np.ndarray:
    """One 2D slice along `axis`. With flip=True the slice's SECOND axis is
    reversed for axes 0 and 1 (not 2) — the reference's direction fix for
    formats without orientation metadata (tools/ExtractSlices.cxx:217-231:
    flipAxes = [false, axisIndex != 2])."""
    sl = [slice(None)] * 3
    sl[axis] = index
    plane = np.asarray(vol)[tuple(sl)]
    if flip and axis != 2:
        plane = plane[:, ::-1]
    return plane
