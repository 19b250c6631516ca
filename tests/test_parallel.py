"""Multi-device parity: sharded ops on the 8-device CPU mesh must agree
with the single-device ops (SURVEY.md §4: same sharded program on 1 vs N
devices must agree after gather)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ife_tpu.core.volume import synthetic_ct, sphere_mask
from ife_tpu.ops.features import features8, multiscale_features
from ife_tpu.ops.stencil import gaussian_smooth, hessian
from ife_tpu.ops.eigen import eigenvalue_features
from ife_tpu.parallel import (
    halo_pad,
    make_mesh,
    shard_volume,
    sharded_features8,
    sharded_hessian_eig,
    sharded_masked_histogram,
    sharded_multiscale_features,
    histogram_quantile_edges,
)
from ife_tpu.stats.histogram import histogram_counts

SPACING = (0.7, 0.9, 1.2)


def _data(shape=(48, 40, 40), dtype=jnp.float64):
    img = synthetic_ct(shape, seed=5, dtype=dtype)
    mask = sphere_mask(shape, 0.42)
    return img.data, mask.data


@pytest.mark.parametrize("axes", [("x",), ("x", "y")])
def test_sharded_features8_matches_single_device(axes):
    img, mask = _data()
    mesh = make_mesh(8, axes)
    want = np.asarray(features8(img, mask, 1.1, SPACING))
    got = np.asarray(
        sharded_features8(shard_volume(img, mesh), shard_volume(mask, mesh),
                          1.1, mesh, SPACING)
    )
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sharded_features8_large_sigma_multihop_halo():
    # sigma large enough that the Gaussian radius exceeds the block size
    # (48/8 = 6 planes per shard, radius ~ 4.5*2.5 = 12) -> multi-hop path
    img, mask = _data()
    mesh = make_mesh(8, ("x",))
    want = np.asarray(features8(img, mask, 2.5, SPACING))
    got = np.asarray(
        sharded_features8(shard_volume(img, mesh), shard_volume(mask, mesh),
                          2.5, mesh, SPACING)
    )
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sharded_hessian_eig_matches_single_device():
    img, _ = _data()
    mesh = make_mesh(8, ("x", "y"))
    want = np.asarray(eigenvalue_features(hessian(img, SPACING)))
    got = np.asarray(sharded_hessian_eig(shard_volume(img, mesh), mesh, SPACING))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sharded_multiscale_matches_single_device():
    img, mask = _data((32, 32, 32))
    mesh = make_mesh(4, ("x",), devices=jax.devices()[:4])
    sigmas = (0.8, 1.6)
    want = np.asarray(multiscale_features(img, mask, sigmas, SPACING))
    got = np.asarray(
        sharded_multiscale_features(
            shard_volume(img, mesh), shard_volume(mask, mesh), sigmas, mesh, SPACING
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_halo_pad_is_edge_replication():
    x = jnp.arange(24.0).reshape(4, 3, 2)
    y = halo_pad(x, 0, 2)
    np.testing.assert_array_equal(np.asarray(y[0]), np.asarray(x[0]))
    np.testing.assert_array_equal(np.asarray(y[1]), np.asarray(x[0]))
    np.testing.assert_array_equal(np.asarray(y[-1]), np.asarray(x[-1]))
    assert y.shape == (8, 3, 2)


def test_sharded_masked_histogram_matches_single_device():
    img, mask = _data((32, 32, 32))
    mesh = make_mesh(8, ("x", "y"))
    edges = jnp.asarray(np.linspace(-900, -100, 7))
    want = np.asarray(
        histogram_counts(img, edges, (mask != 0).astype(jnp.float32))
    )
    got = np.asarray(
        sharded_masked_histogram(
            shard_volume(img, mesh), shard_volume(mask, mesh), edges, mesh
        )
    )
    np.testing.assert_allclose(got, want)
    assert got.sum() == float(np.asarray((mask != 0)).sum())


def test_histogram_quantile_edges_approximates_exact():
    rng = np.random.default_rng(0)
    samples = rng.normal(size=200_000)
    pre_edges = np.linspace(-5, 5, 2001)
    counts = np.asarray(histogram_counts(jnp.asarray(samples), jnp.asarray(pre_edges)))
    approx = histogram_quantile_edges(counts, pre_edges, 10)
    exact = np.quantile(samples, np.arange(1, 10) / 10)
    np.testing.assert_allclose(approx, exact, atol=2e-2)
    assert np.all(np.diff(approx) > 0)


def test_features8_sharded_auto_nondivisible_shape():
    # 45x37x24: neither axis divides the 4x2 mesh -> pad-and-crop path
    from ife_tpu.parallel import features8_sharded_auto
    img = synthetic_ct((45, 37, 24), seed=8, dtype=jnp.float64).data
    mask = sphere_mask((45, 37, 24), 0.44).data
    mesh = make_mesh(8, ("x", "y"))
    want = np.asarray(features8(img, mask, 0.9, SPACING))
    got = np.asarray(features8_sharded_auto(img, mask, 0.9, mesh, SPACING))
    np.testing.assert_allclose(got, want, atol=1e-12)
