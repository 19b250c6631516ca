"""Volume: the core data container — a device array plus physical metadata.

The reference carries images as ``itk::Image`` with origin/spacing metadata
threaded through every filter. Here a Volume is a frozen pytree dataclass:
the voxel array is a traced leaf, spacing/origin/index-offset are static
metadata, so jitted ops specialize on geometry but not on voxel data.

Index order is (x, y, z): axis 0 = ITK direction 0. A mask volume uses the
same container with an integer dtype.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _as_tuple3(v, name: str) -> Tuple[float, float, float]:
    t = tuple(float(x) for x in v)
    if len(t) != 3:
        raise ValueError(f"{name} must have 3 elements, got {len(t)}")
    return t


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Volume:
    """A 3D image: data[x, y, z] + physical geometry.

    Attributes:
      data: jnp/np array of shape (X, Y, Z).
      spacing: voxel size in physical units per axis (sx, sy, sz).
      origin: physical coordinate of voxel (0, 0, 0).
    """

    data: jax.Array
    spacing: Tuple[float, float, float] = dataclasses.field(
        default=(1.0, 1.0, 1.0), metadata=dict(static=True)
    )
    origin: Tuple[float, float, float] = dataclasses.field(
        default=(0.0, 0.0, 0.0), metadata=dict(static=True)
    )

    def __post_init__(self):
        object.__setattr__(self, "spacing", _as_tuple3(self.spacing, "spacing"))
        object.__setattr__(self, "origin", _as_tuple3(self.origin, "origin"))

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.data.shape)

    @property
    def dtype(self):
        return self.data.dtype

    def with_data(self, data) -> "Volume":
        """Same geometry, new voxel data."""
        return Volume(data=data, spacing=self.spacing, origin=self.origin)

    def astype(self, dtype) -> "Volume":
        return self.with_data(self.data.astype(dtype))

    def numpy(self) -> np.ndarray:
        return np.asarray(self.data)

    def physical_point(self, index) -> Tuple[float, float, float]:
        """Physical coordinate of a voxel index (continuous indices allowed)."""
        return tuple(
            self.origin[d] + self.spacing[d] * float(index[d]) for d in range(3)
        )

    def crop(self, start, size) -> "Volume":
        """Extract a region-of-interest box; origin shifts accordingly.

        Mirrors itk::RegionOfInterestImageFilter semantics (used per ROI in
        reference tools/MakeBag.cxx:426-430).
        """
        sl = tuple(slice(int(start[d]), int(start[d]) + int(size[d])) for d in range(3))
        new_origin = self.physical_point(start)
        return Volume(data=self.data[sl], spacing=self.spacing, origin=new_origin)


def synthetic_ct(shape=(64, 64, 64), seed=0, dtype=jnp.float32) -> Volume:
    """A smooth synthetic CT-like volume for tests/benchmarks.

    Band-limited random field scaled to CT-ish intensities [-1000, 0].
    """
    rng = np.random.default_rng(seed)
    small_shape = [max(2, s // 8) for s in shape]
    small = rng.standard_normal(small_shape)
    # upsample by repetition (factor rounded up so every axis covers `shape`)
    arr = small
    for axis in range(3):
        factor = -(-shape[axis] // small_shape[axis])
        arr = np.repeat(arr, factor, axis=axis)[
            tuple(slice(0, shape[a]) if a == axis else slice(None) for a in range(3))
        ]
    arr = arr[: shape[0], : shape[1], : shape[2]]
    for axis in range(3):
        arr = (
            np.roll(arr, 1, axis) + arr + np.roll(arr, -1, axis)
        ) / 3.0
    arr = (arr - arr.min()) / max(float(np.ptp(arr)), 1e-9)
    arr = -1000.0 + 1000.0 * arr
    return Volume(jnp.asarray(arr, dtype=dtype))


def sphere_mask(shape=(64, 64, 64), radius_frac=0.4, dtype=jnp.uint8) -> Volume:
    """Binary sphere mask centered in the volume."""
    coords = np.ogrid[tuple(slice(0, s) for s in shape)]
    center = [(s - 1) / 2.0 for s in shape]
    r2 = sum(((c - m) / (radius_frac * s)) ** 2 for c, m, s in zip(coords, center, shape))
    return Volume(jnp.asarray(r2 <= 1.0, dtype=dtype))
