"""Independent NumPy/SciPy re-derivation of the reference pipeline semantics.

Used as the golden oracle for volume-level tests (the reference repo has no
filter-level tests; SURVEY.md §4 prescribes fresh goldens via a NumPy
re-derivation, mirroring the numpy-oracle pattern of its eigen test).

Deliberately written with different machinery than ife_tpu (scipy.ndimage
convolutions, numpy.linalg.eigvalsh) so agreement is meaningful.
"""
import numpy as np
from scipy import ndimage


def derivative_np(x, axis, order, spacing=1.0):
    """Central difference with edge-replicate boundary."""
    xp = np.pad(x, [(1, 1) if a == axis else (0, 0) for a in range(x.ndim)], mode="edge")
    sl = lambda o: tuple(
        slice(o, o + x.shape[a]) if a == axis else slice(None) for a in range(x.ndim)
    )
    fm, f0, fp = xp[sl(0)], xp[sl(1)], xp[sl(2)]
    if order == 1:
        return (fp - fm) / (2.0 * spacing)
    return (fp - 2.0 * f0 + fm) / (spacing * spacing)


def gradient_magnitude_np(x, spacing=(1, 1, 1)):
    return np.sqrt(sum(derivative_np(x, d, 1, spacing[d]) ** 2 for d in range(3)))


def hessian_np(x, spacing=(1, 1, 1)):
    """[Dxx, Dxy, Dxz, Dyy, Dyz, Dzz], cross terms as cascaded 1st-order."""
    dx = derivative_np(x, 0, 1, spacing[0])
    dy = derivative_np(x, 1, 1, spacing[1])
    return np.stack(
        [
            derivative_np(x, 0, 2, spacing[0]),
            derivative_np(dx, 1, 1, spacing[1]),
            derivative_np(dx, 2, 1, spacing[2]),
            derivative_np(x, 1, 2, spacing[1]),
            derivative_np(dy, 2, 1, spacing[2]),
            derivative_np(x, 2, 2, spacing[2]),
        ],
        axis=-1,
    )


def gaussian_np(x, sigma, spacing=(1, 1, 1), truncate=4.5):
    """Separable sampled-Gaussian, sigma in physical units, edge replicate."""
    y = x.astype(np.float64, copy=True)
    for d in range(3):
        sv = sigma / spacing[d]
        # match ife_tpu's radius = ceil(truncate * sigma_vox)
        radius = max(1, int(np.ceil(truncate * sv)))
        y = ndimage.gaussian_filter1d(y, sv, axis=d, mode="nearest", radius=radius)
    return y


def normalized_conv_np(image, certainty, sigma, spacing=(1, 1, 1), truncate=4.5):
    c = certainty.astype(np.float64)
    num = gaussian_np(image * c, sigma, spacing, truncate)
    den = gaussian_np(c, sigma, spacing, truncate)
    with np.errstate(divide="ignore", invalid="ignore"):
        return num / den


def eig_features_np(H):
    """Eigen features from packed Hessian (..., 6) via numpy.linalg.eigvalsh,
    reordered to |e3| <= |e2| <= |e1|."""
    M = np.zeros(H.shape[:-1] + (3, 3))
    M[..., 0, 0] = H[..., 0]
    M[..., 0, 1] = M[..., 1, 0] = H[..., 1]
    M[..., 0, 2] = M[..., 2, 0] = H[..., 2]
    M[..., 1, 1] = H[..., 3]
    M[..., 1, 2] = M[..., 2, 1] = H[..., 4]
    M[..., 2, 2] = H[..., 5]
    ev = np.linalg.eigvalsh(M)
    order = np.argsort(-np.abs(ev), axis=-1, kind="stable")
    ev = np.take_along_axis(ev, order, axis=-1)
    s = ev.sum(-1)
    p = ev.prod(-1)
    f = np.sqrt((ev**2).sum(-1))
    return np.concatenate([ev, s[..., None], p[..., None], f[..., None]], axis=-1)


def features8_np(image, mask, sigma, spacing=(1, 1, 1), truncate=4.5):
    m = np.clip(mask, 0, 1).astype(np.float64)
    sm = normalized_conv_np(image.astype(np.float64), m, sigma, spacing, truncate)
    # nan/inf only exists > FIR-radius away from the mask (0/0 divisions);
    # zero it so eigvalsh accepts the input — all affected voxels are masked.
    sm = np.where(np.isfinite(sm), sm, 0.0)
    gm = gradient_magnitude_np(sm, spacing)
    eig = eig_features_np(hessian_np(sm, spacing))
    feats = np.concatenate([sm[..., None], gm[..., None], eig], axis=-1)
    return np.where((m != 0)[..., None], feats, 0.0)
