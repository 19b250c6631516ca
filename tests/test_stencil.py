"""Golden tests for stencil ops vs the independent NumPy/SciPy re-derivation."""
import numpy as np
import jax.numpy as jnp
import pytest

from ife_tpu.ops import stencil
from tests import numpy_ref as ref


def vol(shape=(24, 20, 16), seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape) * 100.0


SPACING = (0.7, 0.8, 1.25)


@pytest.mark.parametrize("axis", [0, 1, 2])
@pytest.mark.parametrize("order", [1, 2])
def test_derivative(axis, order):
    x = vol()
    got = np.asarray(stencil.derivative(jnp.asarray(x), axis, order, SPACING[axis]))
    want = ref.derivative_np(x, axis, order, SPACING[axis])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_gradient_magnitude():
    x = vol(seed=1)
    got = np.asarray(stencil.gradient_magnitude(jnp.asarray(x), SPACING))
    want = ref.gradient_magnitude_np(x, SPACING)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_hessian_channels():
    x = vol(seed=2)
    got = np.asarray(stencil.hessian(jnp.asarray(x), SPACING))
    want = ref.hessian_np(x, SPACING)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-10)


def test_hessian_symmetry_interior():
    """Dxy == Dyx on the interior (cascaded stencils commute away from
    boundaries)."""
    x = vol(seed=3)
    xj = jnp.asarray(x)
    dxy = stencil.derivative(stencil.derivative(xj, 0, 1), 1, 1)
    dyx = stencil.derivative(stencil.derivative(xj, 1, 1), 0, 1)
    interior = (slice(2, -2),) * 3
    np.testing.assert_allclose(
        np.asarray(dxy)[interior], np.asarray(dyx)[interior], rtol=1e-10, atol=1e-10
    )


def test_gaussian_matches_scipy():
    x = vol((32, 28, 24), seed=4)
    for sigma in (0.5, 1.0, 2.0):
        got = np.asarray(
            stencil.gaussian_smooth(jnp.asarray(x), sigma, SPACING)
        )
        want = ref.gaussian_np(x, sigma, SPACING)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_gaussian_normalization():
    """Constant volume stays constant (taps normalized, edge replicate)."""
    x = jnp.full((16, 16, 16), 7.25, dtype=jnp.float64)
    got = np.asarray(stencil.gaussian_smooth(x, 1.5))
    np.testing.assert_allclose(got, 7.25, rtol=1e-12)


def test_gaussian_impulse_symmetric():
    x = np.zeros((33, 33, 33))
    x[16, 16, 16] = 1.0
    got = np.asarray(stencil.gaussian_smooth(jnp.asarray(x), 2.0))
    np.testing.assert_allclose(got, got[::-1, :, :], atol=1e-15)
    np.testing.assert_allclose(got, got[:, ::-1, :], atol=1e-15)
    np.testing.assert_allclose(got, got[:, :, ::-1], atol=1e-15)
    np.testing.assert_allclose(got.sum(), 1.0, rtol=1e-9)


def test_normalized_convolution():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((24, 24, 24)) * 500.0 - 500.0
    mask = np.zeros((24, 24, 24))
    mask[4:20, 6:18, 5:19] = 1.0
    got = np.asarray(
        stencil.normalized_gaussian_convolution(
            jnp.asarray(x), jnp.asarray(mask), 1.2, SPACING
        )
    )
    want = ref.normalized_conv_np(x, mask, 1.2, SPACING)
    inside = mask != 0
    np.testing.assert_allclose(got[inside], want[inside], rtol=1e-8, atol=1e-8)


def test_normalized_convolution_constant_inside():
    """On a constant image, normalized conv returns the constant inside the
    mask support (the defining property of Knutsson-Westin normalization)."""
    x = jnp.full((20, 20, 20), -321.5, dtype=jnp.float64)
    mask = np.zeros((20, 20, 20))
    mask[5:15, 5:15, 5:15] = 1.0
    got = np.asarray(
        stencil.normalized_gaussian_convolution(x, jnp.asarray(mask), 2.0)
    )
    np.testing.assert_allclose(got[mask != 0], -321.5, rtol=1e-9)


def test_band_matrix_paths_match_conv():
    # The TPU smoothing path contracts banded matrices on the MXU
    # (stencil._band_matrix / _band_matrix_valid + _einsum_axis); CI runs
    # on CPU where the conv path is taken, so check the matrices
    # themselves reproduce the conv path bit-for-bit in f64.
    import numpy as np
    import jax.numpy as jnp
    from ife_tpu.ops import stencil

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((17, 13, 21)))
    sigma, spacing = 1.3, (0.8, 1.0, 1.4)
    want = stencil.gaussian_smooth(x, sigma, spacing)

    got = x
    for axis in range(3):
        sv = sigma / spacing[axis]
        r = stencil.gaussian_radius(sv)
        W = jnp.asarray(stencil._band_matrix(got.shape[axis], sv, r))
        got = stencil._einsum_axis(W, got, axis)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-12)

    # VALID variant: extended input (edge-padded here, halo slabs in the
    # sharded path) -> kept region equals the edge-folded square result
    sv = sigma / spacing[0]
    r = stencil.gaussian_radius(sv)
    x_ext = stencil._edge_pad(x, 0, r, r)
    Wv = jnp.asarray(stencil._band_matrix_valid(x_ext.shape[0], sv, r))
    got_v = stencil._einsum_axis(Wv, x_ext, 0)
    W0 = jnp.asarray(stencil._band_matrix(x.shape[0], sv, r))
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(stencil._einsum_axis(W0, x, 0)),
        rtol=0, atol=1e-12)
