"""Finite-difference and separable-Gaussian stencils with ZeroFluxNeumann
boundaries, as whole-volume XLA programs.

The reference builds these from ITK filter objects:
  * itk::DerivativeImageFilter (central differences, ZeroFluxNeumann
    boundary, spacing-scaled) — used 8x by the Hessian
    (reference: include/ife/Filters/Hessian3DImageFilter.hxx:19-59; the
    central-difference + ZeroFluxNeumann convention is documented at
    reference tools/FiniteDifference_HessianFeatures.cxx:4-7);
  * itk::GradientMagnitudeImageFilter (3-axis central difference,
    spacing-scaled, ZeroFluxNeumann);
  * itk::SmoothingRecursiveGaussianImageFilter (Deriche IIR approximation,
    sigma in physical units).

TPU-first design notes:
  * Each stencil is a pad(edge)+shift+fma expression — XLA fuses the whole
    thing into one VPU pass; there are no per-filter full-volume
    intermediates like ITK's demand-driven DAG.
  * The Gaussian is a truncated FIR sampled-Gaussian (radius ~ 4.5 sigma,
    tail mass < 1e-5) instead of ITK's IIR recursion: an IIR scan is
    sequential along an axis (bad for a 512-lane vector unit), while FIR
    taps vectorize perfectly and the truncation error is comparable to the
    Deriche approximation error of the reference. This is the documented
    divergence called out in SURVEY.md §7.
  * FIR convolution is applied axis-by-axis via a banded-matrix contraction
    (jnp.einsum over an (N_out, N_in) tap matrix). On TPU this rides the
    MXU, which beats gather/shift chains on the VPU for K up to ~50 taps.
"""
from __future__ import annotations

import functools
import math
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


Axis = int  # 0=x, 1=y, 2=z (ITK direction order)

# MXU precision for the Gaussian band contractions. HIGHEST (6-pass f32
# decomposition) was the conservative round-1 choice; the 3-pass HIGH
# halves MXU work at ~1e-6 relative error — far inside the 1e-4 on-chip
# verify budget (r5_probe20 measures both). Module-level so probes can
# flip it (with jax.clear_caches()); the product default is set from the
# measured accuracy/speed trade.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def _edge_pad(x: jnp.ndarray, axis: Axis, lo: int, hi: int) -> jnp.ndarray:
    """ZeroFluxNeumann = replicate the boundary voxel."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (lo, hi)
    return jnp.pad(x, pad, mode="edge")


def _shift(x: jnp.ndarray, axis: Axis, offset: int, size: int) -> jnp.ndarray:
    """Slice a window of `size` at `offset` along axis from a padded array."""
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(offset, offset + size)
    return x[tuple(idx)]


def derivative(
    x: jnp.ndarray, axis: Axis, order: int, spacing: float = 1.0
) -> jnp.ndarray:
    """Central-difference derivative along one axis.

    order=1: (f[i+1] - f[i-1]) / (2h);  order=2: (f[i+1] - 2 f[i] + f[i-1]) / h^2.
    ZeroFluxNeumann boundary (edge replicate). Mirrors
    itk::DerivativeImageFilter as wired by the reference Hessian
    (Hessian3DImageFilter.hxx:23-51).
    """
    n = x.shape[axis]
    xp = _edge_pad(x, axis, 1, 1)
    fm = _shift(xp, axis, 0, n)
    f0 = _shift(xp, axis, 1, n)
    fp = _shift(xp, axis, 2, n)
    # multiply by the f64-folded reciprocal (same constant as the fused
    # Pallas kernel, so the two paths agree to the ulp; divides are the
    # slow VPU op class on TPU)
    h = float(spacing)
    if order == 1:
        return (fp - fm) * jnp.asarray(1.0 / (2.0 * h), x.dtype)
    elif order == 2:
        return (fp - 2 * f0 + fm) * jnp.asarray(1.0 / (h * h), x.dtype)
    raise ValueError(f"order must be 1 or 2, got {order}")


def gradient_magnitude(
    x: jnp.ndarray, spacing: Sequence[float] = (1.0, 1.0, 1.0)
) -> jnp.ndarray:
    """sqrt(sum_d (df/dx_d)^2) with central differences.

    Mirrors itk::GradientMagnitudeImageFilter as used at
    reference ImageToEmphysemaFeaturesFilter.hxx:27-28.
    """
    acc = None
    for d in range(3):
        g = derivative(x, d, 1, spacing[d])
        acc = g * g if acc is None else acc + g * g
    return jnp.sqrt(acc)


def hessian(
    x: jnp.ndarray, spacing: Sequence[float] = (1.0, 1.0, 1.0)
) -> jnp.ndarray:
    """6-channel Hessian, channel order [Dxx, Dxy, Dxz, Dyy, Dyz, Dzz].

    Pure second derivatives are single order-2 stencils; cross derivatives
    are CASCADED order-1 stencils (Dx then Dy, Dx then Dz, Dy then Dz), each
    pass applying its own ZeroFluxNeumann boundary — this matches the
    reference wiring exactly (Hessian3DImageFilter.hxx:31-59), which differs
    from a single 2D cross stencil in the two boundary layers.

    Returns array (..., 6) stacked on a new trailing axis.
    """
    dxx = derivative(x, 0, 2, spacing[0])
    dyy = derivative(x, 1, 2, spacing[1])
    dzz = derivative(x, 2, 2, spacing[2])
    dx = derivative(x, 0, 1, spacing[0])
    dy = derivative(x, 1, 1, spacing[1])
    dxy = derivative(dx, 1, 1, spacing[1])
    dxz = derivative(dx, 2, 1, spacing[2])
    dyz = derivative(dy, 2, 1, spacing[2])
    return jnp.stack([dxx, dxy, dxz, dyy, dyz, dzz], axis=-1)


# ---------------------------------------------------------------------------
# Gaussian smoothing
# ---------------------------------------------------------------------------

def gaussian_radius(sigma_vox: float, truncate: float = 4.5) -> int:
    """FIR truncation radius in voxels for a given sigma (in voxels)."""
    return max(1, int(math.ceil(truncate * sigma_vox)))


@functools.lru_cache(maxsize=256)
def _gaussian_taps(sigma_vox: float, radius: int) -> np.ndarray:
    """Normalized sampled-Gaussian taps, length 2*radius+1 (float64)."""
    i = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-(i * i) / (2.0 * sigma_vox * sigma_vox))
    return g / g.sum()


@functools.lru_cache(maxsize=1024)
def _band_matrix(n: int, sigma_vox: float, radius: int) -> np.ndarray:
    """(n, n) matrix W with W[o, i] = sum of taps mapping padded-in i to out o
    under edge replication. out = W @ in  along the convolved axis."""
    taps = _gaussian_taps(sigma_vox, radius)
    W = np.zeros((n, n), dtype=np.float64)
    for t_idx, t in enumerate(taps):
        offs = t_idx - radius
        for o in range(n):
            src = min(max(o + offs, 0), n - 1)  # edge replication
            W[o, src] += t
    return W


@functools.lru_cache(maxsize=1024)
def _band_matrix_valid(n_in: int, sigma_vox: float, radius: int) -> np.ndarray:
    """(n_in - 2*radius, n_in) VALID band matrix: W[o, o+t] = taps[t]."""
    taps = _gaussian_taps(sigma_vox, radius)
    n_out = n_in - 2 * radius
    W = np.zeros((n_out, n_in), dtype=np.float64)
    for t_idx, t in enumerate(taps):
        W[np.arange(n_out), np.arange(n_out) + t_idx] = t
    return W


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _einsum_axis(W: jnp.ndarray, x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Contract W (n_out, n_in) against x along `axis` on the MXU.

    On TPU a banded-matrix matmul beats the conv lowering ~5x at 512^3
    (benchmarks/probe5.py: 6.4 ms vs 34 ms per volume-axis pass) — the MXU
    eats the O(n)-vs-O(K) FLOP overhead for free while the conv path pays
    VPU relayouts/transposes per axis.
    """
    letters = "abcdefghij"
    in_sub = letters[: x.ndim]
    out_sub = in_sub.replace(in_sub[axis], "o")
    return jnp.einsum(
        f"o{in_sub[axis]},{in_sub}->{out_sub}", W, x,
        precision=MATMUL_PRECISION,
    )


def _blocked_band_axis(
    W: jnp.ndarray, x: jnp.ndarray, axis: int, radius: int
) -> jnp.ndarray:
    """Band-aware blocked contraction of the (n, n) band matrix W against x
    along `axis`.

    A dense (n, n) MXU contraction does O(n) FLOPs per voxel for a band of
    width 2*radius+1 — at n=512, K=13 that is ~40x wasted MXU work, and the
    measured 19 ms/volume smoothing cost is exactly that FLOP wall. Blocking
    the OUTPUT axis into tiles of B and contracting each tile against only
    its (B + 2*radius) input window cuts the per-voxel FLOPs to
    O(B + 2*radius); B is chosen so the contraction extent is the 128-wide
    MXU tile (minus what the band halo needs), i.e. ~4x fewer MXU passes at
    n=512. Slicing the SAME dense W preserves the edge-replication rows
    exactly, so results are bit-comparable to the dense path up to f32
    sum-order roundoff.
    """
    n = x.shape[axis]
    B = max(8, 128 - 2 * radius)
    if n <= B + 2 * radius:  # window would cover everything — dense wins
        return _einsum_axis(W, x, axis)
    outs = []
    for b0 in range(0, n, B):
        b1 = min(b0 + B, n)
        lo = max(0, b0 - radius)
        hi = min(n, b1 + radius)
        Wb = jax.lax.slice(W, (b0, lo), (b1, hi))
        xw = jax.lax.slice_in_dim(x, lo, hi, axis=axis)
        outs.append(_einsum_axis(Wb, xw, axis))
    return jnp.concatenate(outs, axis=axis)


def _conv1d_valid(x_last: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """VALID 1D convolution along the last axis: (..., n+K-1) -> (..., n).

    taps are symmetric, so convolution == correlation (no flip needed).
    """
    lead = x_last.shape[:-1]
    lhs = x_last.reshape((-1, 1, x_last.shape[-1]))
    rhs = taps.reshape((1, 1, taps.shape[0]))
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=MATMUL_PRECISION,
        preferred_element_type=x_last.dtype,
    )
    return out.reshape(lead + (out.shape[-1],))


def convolve_valid_axis(
    x_ext: jnp.ndarray, axis: Axis, sigma_vox: float, radius: int
) -> jnp.ndarray:
    """VALID Gaussian along `axis` of an already-extended array
    ((..., n+2*radius, ...) -> (..., n, ...)). TPU: banded MXU contraction;
    elsewhere: 1D conv. Used by the sharded halo path."""
    if _on_tpu():
        W = jnp.asarray(
            _band_matrix_valid(x_ext.shape[axis], sigma_vox, radius),
            dtype=x_ext.dtype,
        )
        return _einsum_axis(W, x_ext, axis)
    taps = jnp.asarray(_gaussian_taps(sigma_vox, radius), dtype=x_ext.dtype)
    y = _conv1d_valid(jnp.moveaxis(x_ext, axis, -1), taps)
    return jnp.moveaxis(y, -1, axis)


def gaussian_smooth_axis(
    x: jnp.ndarray, axis: Axis, sigma: float, spacing: float = 1.0,
    truncate: float = 4.5,
) -> jnp.ndarray:
    """1D Gaussian along `axis`, sigma in PHYSICAL units (like ITK),
    ZeroFluxNeumann boundary: edge-pad + VALID convolution.

    O(K) work per voxel (K = 2*radius+1 taps). An earlier design used a
    dense (n, n) banded-matrix MXU contraction — O(n) per voxel, ~50x the
    FLOPs at n=512 for an 11-tap kernel; the conv form is the roofline
    choice and XLA:TPU lowers small-K convs efficiently.
    """
    if sigma <= 0:
        return x
    sigma_vox = float(sigma) / float(spacing)
    radius = gaussian_radius(sigma_vox, truncate)
    if _on_tpu():
        # square band matrix with the edge replication folded into the
        # boundary rows — no pad pass, MXU contractions blocked along the
        # output axis so the FLOPs track the band width, not n (see
        # _blocked_band_axis; identical to the conv path to f32 roundoff)
        W = jnp.asarray(
            _band_matrix(x.shape[axis], sigma_vox, radius), dtype=x.dtype
        )
        return _blocked_band_axis(W, x, axis, radius)
    taps = jnp.asarray(_gaussian_taps(sigma_vox, radius), dtype=x.dtype)
    xp = _edge_pad(x, axis, radius, radius)
    y = _conv1d_valid(jnp.moveaxis(xp, axis, -1), taps)
    return jnp.moveaxis(y, -1, axis)


def gaussian_smooth(
    x: jnp.ndarray,
    sigma: float,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    truncate: float = 4.5,
) -> jnp.ndarray:
    """Separable isotropic (in physical units) Gaussian smoothing.

    Semantics target: itk::SmoothingRecursiveGaussianImageFilter with
    SetSigma(sigma) (reference NormalizedGaussianConvolutionImageFilter
    .hxx:51-55). We use a truncated FIR sampled Gaussian — documented
    divergence from the Deriche IIR approximation; both approximate the
    continuous Gaussian, parity is established against the exact kernel.
    """
    for d in range(3):
        x = gaussian_smooth_axis(x, d, sigma, spacing[d], truncate)
    return x


def normalized_gaussian_convolution(
    image: jnp.ndarray,
    certainty: jnp.ndarray,
    sigma: float,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    truncate: float = 4.5,
) -> jnp.ndarray:
    """Knutsson–Westin normalized convolution, 0th order:
    out = G_sigma*(c*T) / G_sigma*c.

    Mirrors reference NormalizedGaussianConvolutionImageFilter.hxx:40-63:
    multiply -> two Gaussians -> divide, with NO epsilon in the divide.
    Far outside the certainty support this is IEEE 0/0 = nan, exactly like
    the reference; callers mask the result (SURVEY.md §7 hard-part 5).
    """
    c = certainty.astype(image.dtype)
    # numerator and denominator are smoothed SEPARATELY: batching them on
    # a stacked channel axis measures ~2x slower on TPU either way round
    # (trailing size-2 lands on the 128-lane minor dim; leading size-2
    # degrades the einsum's matmul tiling) — plain 3D contractions win.
    num = gaussian_smooth(image * c, sigma, spacing, truncate)
    den = gaussian_smooth(c, sigma, spacing, truncate)
    return num / den
