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
