"""Fused Pallas kernel parity vs the XLA-composed ops.

Comparison notes:
  * Pallas lowers cos/acos with TPU polynomial approximations (the
    interpreter emulates this), so bitwise parity with XLA:CPU is not
    attainable — tolerance is ~1e-8 relative in f64, far below the 1e-5
    north star.
  * The |.|-descending eigenvalue ORDER is genuinely unstable where |e_i|
    ties (opposite-sign pairs: the synthetic volume has exact ones) — any
    ulp-level perturbation swaps channels 1/2 there, in the reference C++
    too. Parity therefore compares the value-sorted eigenvalue SET plus the
    order-independent symmetric channels (LoG, curvature, Frobenius).
"""
import numpy as np
import jax.numpy as jnp

from ife_tpu.core.volume import synthetic_ct
from ife_tpu.kernels.fused import fused_hessian_eig
from ife_tpu.ops.eigen import eigenvalue_features
from ife_tpu.ops.stencil import hessian

SPACING = (0.7, 0.9, 1.2)


def _want(x):
    return np.asarray(eigenvalue_features(hessian(x, SPACING)))


def _got(x, block=8):
    out = fused_hessian_eig(x, SPACING, block=block, interpret=True)
    return np.moveaxis(np.asarray(out), 0, -1)


def _assert_feature_parity(got, want, rtol):
    ws = np.sort(want[..., :3], axis=-1)
    gs = np.sort(got[..., :3], axis=-1)
    scale = np.abs(ws).max()
    assert np.abs(gs - ws).max() / scale < rtol, np.abs(gs - ws).max() / scale
    for c in (3, 4, 5):
        s = max(np.abs(want[..., c]).max(), 1.0)
        rel = np.abs(got[..., c] - want[..., c]).max() / s
        assert rel < rtol, (c, rel)


def test_fused_matches_ops_f64():
    x = synthetic_ct((16, 16, 16), seed=2, dtype=jnp.float64).data
    _assert_feature_parity(_got(x), _want(x), rtol=1e-7)


def test_fused_f32_as_accurate_as_xla_path():
    # f32's closed-form eigen solve has an intrinsic ~1e-4 relative noise
    # floor at conditioning hotspots (SURVEY.md §7 hard-part 1) — so the f32
    # criterion is: fused is no less accurate than XLA, vs the f64 truth.
    x = synthetic_ct((16, 16, 16), seed=2, dtype=jnp.float32).data
    truth = _want(x.astype(jnp.float64))
    t_sorted = np.sort(truth[..., :3], axis=-1)
    scale = np.abs(t_sorted).max()

    def set_err(feats):
        return np.abs(np.sort(feats[..., :3].astype(np.float64), axis=-1)
                      - t_sorted).max() / scale

    e_xla = set_err(_want(x))
    e_fused = set_err(_got(x))
    assert e_fused < max(2 * e_xla, 1e-6), (e_fused, e_xla)
    for c in (3, 4, 5):
        s = max(np.abs(truth[..., c]).max(), 1.0)
        ex = np.abs(_want(x)[..., c] - truth[..., c]).max() / s
        ef = np.abs(_got(x)[..., c] - truth[..., c]).max() / s
        assert ef < max(2 * ex, 1e-6), (c, ef, ex)


def test_fused_nondivisible_and_uneven_blocks():
    # 12x10x16 with block target 8 -> picks divisors (6, 5)
    x = synthetic_ct((12, 10, 16), seed=3, dtype=jnp.float64).data
    _assert_feature_parity(_got(x, block=8), _want(x), rtol=1e-7)


def test_fused_prime_extent_pads_to_block():
    # X=13, Y=11 are prime: _pick_block must pad to the target block
    # (13 -> 16 with bx=8 at 3/4 rule...) instead of degrading to 1-row
    # blocks; outputs must still match the unfused ops exactly.
    x = synthetic_ct((13, 11, 16), seed=7, dtype=jnp.float64).data
    bx, Xp = __import__("ife_tpu.kernels.fused", fromlist=["_pick_block"])._pick_block(13, 8)
    assert (bx, Xp) == (8, 16)  # padded, not degraded
    _assert_feature_parity(_got(x, block=8), _want(x), rtol=1e-7)


def test_fused_features8_prime_extent(monkeypatch):
    import jax.numpy as jnp
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.kernels.fused import fused_features8
    from ife_tpu.ops.features import features8

    x = synthetic_ct((13, 11, 16), seed=8, dtype=jnp.float64).data
    mask = sphere_mask((13, 11, 16), 0.45).data
    want = np.asarray(features8(x, mask, 0.9, SPACING))
    got = np.moveaxis(
        np.asarray(fused_features8(x, mask, 0.9, SPACING, interpret=True)),
        0, -1,
    )
    for c in (0, 1):
        s = max(np.abs(want[..., c]).max(), 1.0)
        assert np.abs(got[..., c] - want[..., c]).max() / s < 1e-7, c
    _assert_feature_parity(got[..., 2:], want[..., 2:], rtol=1e-7)


def test_fused_block_1_edge_case():
    x = synthetic_ct((4, 4, 8), seed=4, dtype=jnp.float64).data
    _assert_feature_parity(_got(x, block=1), _want(x), rtol=1e-7)


def test_fused_features8_matches_ops(monkeypatch):
    import jax.numpy as jnp
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.kernels.fused import fused_features8
    from ife_tpu.ops.features import features8

    x = synthetic_ct((16, 16, 16), seed=5, dtype=jnp.float64).data
    mask = sphere_mask((16, 16, 16), 0.45).data
    want = np.asarray(features8(x, mask, 1.1, SPACING))
    got = np.moveaxis(
        np.asarray(fused_features8(x, mask, 1.1, SPACING, interpret=True)),
        0, -1,
    )
    # masked region zero everywhere
    outside = np.asarray(mask) == 0
    assert np.all(got[outside] == 0)
    # smoothed + gradmag channels: direct comparison (no eigen ordering)
    for c in (0, 1):
        s = max(np.abs(want[..., c]).max(), 1.0)
        assert np.abs(got[..., c] - want[..., c]).max() / s < 1e-7, c
    # eigen channels via sorted sets + symmetric functions
    _assert_feature_parity(got[..., 2:], want[..., 2:], rtol=1e-7)



# ---------------------------------------------------------------------------
# fused_features8_xs (x-smoothing + divide folded into the post kernel)
# ---------------------------------------------------------------------------
#
# NOTE the retired predecessor: fused_features8_full (ALL smoothing inside
# one kernel, in-kernel y/z MXU matmuls + a ys scratch) was measured on a
# v5e at 512^3 to be no faster than the staged path (44.2 vs 43.4 ms) AND
# to produce wrong derivative channels on real hardware while its
# interpreter parity was 1e-14 — a Mosaic lowering fault in the in-kernel
# matmul/scratch path. It was deleted (round 3); the negative result is
# recorded in docs/design.md. fused_features8_xs keeps the in-kernel work
# VPU-only (leading-axis tap FMAs + divide) precisely to avoid that class
# of lowering, and its on-chip parity is gated by bench.py --verify.


def _xs(x, mask, sigma, **kw):
    from ife_tpu.kernels.fused import fused_features8_xs

    return np.moveaxis(
        np.asarray(
            fused_features8_xs(x, mask, sigma, SPACING, interpret=True, **kw)
        ), 0, -1,
    )


def _features8_channel_parity(got, want, rtol):
    for c in (0, 1):
        s = max(np.abs(want[..., c]).max(), 1.0)
        assert np.abs(got[..., c] - want[..., c]).max() / s < rtol, c
    _assert_feature_parity(got[..., 2:], want[..., 2:], rtol=rtol)


def test_xs_fused_features8_matches_ops_f64():
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((16, 16, 16), seed=5, dtype=jnp.float64).data
    mask = sphere_mask((16, 16, 16), 0.45).data
    want = np.asarray(features8(x, mask, 1.1, SPACING))
    got = _xs(x, mask, 1.1)
    outside = np.asarray(mask) == 0
    assert np.all(got[outside] == 0)
    _features8_channel_parity(got, want, 1e-7)


def test_xs_fused_radius_larger_than_volume():
    # sigma 2.5 on 16^3: the x smoothing radius (17 voxels on the 0.7
    # axis) exceeds the extent — every window is all-boundary; the
    # in-kernel tap pass over the edge-replicated pad plus the global-row
    # re-clamp must still match the XLA-composed op.
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((16, 16, 16), seed=6, dtype=jnp.float64).data
    mask = sphere_mask((16, 16, 16), 0.45).data
    want = np.asarray(features8(x, mask, 2.5, SPACING))
    _features8_channel_parity(_xs(x, mask, 2.5), want, 1e-7)


def test_xs_fused_prime_extents_and_blocks():
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((13, 11, 16), seed=7, dtype=jnp.float64).data
    mask = sphere_mask((13, 11, 16), 0.45).data
    want = np.asarray(features8(x, mask, 0.9, SPACING))
    _features8_channel_parity(_xs(x, mask, 0.9), want, 1e-7)


def test_xs_fused_f32_as_accurate_as_xla():
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((16, 16, 16), seed=5, dtype=jnp.float32).data
    mask = sphere_mask((16, 16, 16), 0.45).data
    truth = np.asarray(
        features8(x.astype(jnp.float64), mask, 1.1, SPACING)
    )
    got = _xs(x, mask, 1.1).astype(np.float64)
    xla = np.asarray(features8(x, mask, 1.1, SPACING)).astype(np.float64)

    def errs(f):
        out = []
        for c in range(8):
            s = max(np.abs(truth[..., c]).max(), 1.0)
            if c in (2, 3, 4):
                a = np.sort(f[..., 2:5], axis=-1)
                b = np.sort(truth[..., 2:5], axis=-1)
                out.append(np.abs(a - b).max() / s)
            else:
                out.append(np.abs(f[..., c] - truth[..., c]).max() / s)
        return np.array(out)

    e_xs, e_xla = errs(got), errs(xla)
    assert np.all(e_xs < np.maximum(2 * e_xla, 1e-6)), (e_xs, e_xla)


# ---------------------------------------------------------------------------
# fused_features8_tap (ALL smoothing axes + divide folded into one kernel)
# ---------------------------------------------------------------------------
#
# The tap kernel is the xs design taken to its conclusion: x taps
# (leading-axis slices), y taps (sublane slices), z taps (edge-clamped
# incremental lane shifts) — still strictly VPU FMA chains, no in-kernel
# matmuls, no persistent scratch (the pieces implicated in the retired
# fused_features8_full's on-chip mis-lowering). On-chip parity is gated by
# bench.py --verify like the others.


def _tap(x, mask, sigma, **kw):
    from ife_tpu.kernels.fused import fused_features8_tap

    return np.moveaxis(
        np.asarray(
            fused_features8_tap(x, mask, sigma, SPACING, interpret=True, **kw)
        ), 0, -1,
    )


def test_tap_fused_features8_matches_ops_f64():
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((16, 16, 16), seed=5, dtype=jnp.float64).data
    mask = sphere_mask((16, 16, 16), 0.45).data
    want = np.asarray(features8(x, mask, 1.1, SPACING))
    got = _tap(x, mask, 1.1)
    outside = np.asarray(mask) == 0
    assert np.all(got[outside] == 0)
    _features8_channel_parity(got, want, 1e-7)


def test_tap_fused_radius_larger_than_volume():
    # sigma 2.5 on 16^3: every window is all-boundary along x AND y; the
    # edge-replicated pads + the global row/column re-clamps must still
    # match the XLA-composed op exactly.
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((16, 16, 16), seed=6, dtype=jnp.float64).data
    mask = sphere_mask((16, 16, 16), 0.45).data
    want = np.asarray(features8(x, mask, 2.5, SPACING))
    _features8_channel_parity(_tap(x, mask, 2.5), want, 1e-7)


def test_tap_fused_prime_extents_and_blocks():
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((13, 11, 16), seed=7, dtype=jnp.float64).data
    mask = sphere_mask((13, 11, 16), 0.45).data
    want = np.asarray(features8(x, mask, 0.9, SPACING))
    _features8_channel_parity(_tap(x, mask, 0.9), want, 1e-7)
    # non-divisible block targets exercise _pick_block padding
    _features8_channel_parity(
        _tap(x, mask, 0.9, block=(4, 4)), want, 1e-7
    )


def test_tap_fused_f32_as_accurate_as_xla():
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((16, 16, 16), seed=5, dtype=jnp.float32).data
    mask = sphere_mask((16, 16, 16), 0.45).data
    truth = np.asarray(
        features8(x.astype(jnp.float64), mask, 1.1, SPACING)
    )
    got = _tap(x, mask, 1.1).astype(np.float64)
    xla = np.asarray(features8(x, mask, 1.1, SPACING)).astype(np.float64)

    def errs(f):
        out = []
        for c in range(8):
            s = max(np.abs(truth[..., c]).max(), 1.0)
            if c in (2, 3, 4):
                a = np.sort(f[..., 2:5], axis=-1)
                b = np.sort(truth[..., 2:5], axis=-1)
                out.append(np.abs(a - b).max() / s)
            else:
                out.append(np.abs(f[..., c] - truth[..., c]).max() / s)
        return np.array(out)

    e_tap, e_xla = errs(got), errs(xla)
    # 2.5x (not the xs test's 2x): the sequential per-axis tap accumulation
    # has a different f32 summation order than the einsum path's tree
    # reduction; the eigenvalue-product channel amplifies that roundoff to
    # ~2.2x on this golden. Still inside the documented per-channel error
    # budget (docs/design.md).
    assert np.all(e_tap < np.maximum(2.5 * e_xla, 1e-6)), (e_tap, e_xla)


# ---------------------------------------------------------------------------
# fused_hessian_eig_stream (1D streaming grid, x halo carried across steps)
# ---------------------------------------------------------------------------


def _got_stream(x, block=4):
    from ife_tpu.kernels.fused import fused_hessian_eig_stream

    out = fused_hessian_eig_stream(x, SPACING, block=block, interpret=True)
    return np.moveaxis(np.asarray(out), 0, -1)


def test_stream_matches_ops_f64():
    x = synthetic_ct((24, 20, 16), seed=11, dtype=jnp.float64).data
    _assert_feature_parity(_got_stream(x), _want(x), 1e-9)


def test_stream_odd_shapes_and_blocks():
    # prime extents exercise the edge-pad path; block > X exercises the
    # single-slab degenerate grid (one real step + one re-read step)
    for shape, blk in [((17, 13, 11), 4), ((8, 9, 8), 8), ((6, 9, 8), 16)]:
        x = synthetic_ct(shape, seed=12, dtype=jnp.float64).data
        _assert_feature_parity(_got_stream(x, block=blk), _want(x), 1e-9)


def test_stream_matches_windowed_kernel_f32():
    x = synthetic_ct((24, 16, 16), seed=13, dtype=jnp.float32).data
    a = _got_stream(x)
    b = _got(x)
    # both kernels implement the identical math; f32 sum-order differences
    # only, far below the per-channel budget
    _assert_feature_parity(a, b, 1e-6)


# ---------------------------------------------------------------------------
# fused_features8_sweep (line-sweep: one row per step, ring-buffered input)
# ---------------------------------------------------------------------------


def _sweep(x, mask, sigma, **kw):
    from ife_tpu.kernels.fused import fused_features8_sweep

    return np.moveaxis(
        np.asarray(
            fused_features8_sweep(x, mask, sigma, SPACING, interpret=True,
                                  **kw)
        ), 0, -1,
    )


def test_sweep_fused_features8_matches_ops_f64():
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((16, 16, 16), seed=5, dtype=jnp.float64).data
    mask = sphere_mask((16, 16, 16), 0.45).data
    want = np.asarray(features8(x, mask, 1.1, SPACING))
    got = _sweep(x, mask, 1.1)
    outside = np.asarray(mask) == 0
    assert np.all(got[outside] == 0)
    _features8_channel_parity(got, want, 1e-7)


def test_sweep_fused_radius_larger_than_volume():
    # the ring holds 2*rx+1 = 37 rows for a 16-row volume: every slot is
    # boundary-fed; the row-0 seeding + the tail's row-(n-1) re-reads must
    # reproduce clamp smoothing exactly.
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((16, 16, 16), seed=6, dtype=jnp.float64).data
    mask = sphere_mask((16, 16, 16), 0.45).data
    want = np.asarray(features8(x, mask, 2.5, SPACING))
    _features8_channel_parity(_sweep(x, mask, 2.5), want, 1e-7)


def test_sweep_fused_prime_extents_and_blocks():
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((13, 11, 16), seed=7, dtype=jnp.float64).data
    mask = sphere_mask((13, 11, 16), 0.45).data
    want = np.asarray(features8(x, mask, 0.9, SPACING))
    # prime X with several rows-per-step (exercises the grid pad, the
    # block-0 ring append, and the tail clamp-replica broadcast)
    for blk in (1, 2, 4):
        _features8_channel_parity(_sweep(x, mask, 0.9, block=blk), want,
                                  1e-7)


# ---------------------------------------------------------------------------
# fused_features8_xs_stream (x smoothing + divide + chain over y/z-smoothed
# numerator/denominator — the staged path's fused tail)
# ---------------------------------------------------------------------------


def _xs_stream(x, mask, sigma, **kw):
    import jax.numpy as jnp

    from ife_tpu.kernels.fused import fused_features8_xs_stream
    from ife_tpu.ops.stencil import gaussian_smooth_axis

    m = jnp.clip(mask, 0, 1)
    mf = m.astype(x.dtype)

    def smooth_yz(v):
        v = gaussian_smooth_axis(v, 1, sigma, SPACING[1])
        return gaussian_smooth_axis(v, 2, sigma, SPACING[2])

    return np.moveaxis(
        np.asarray(fused_features8_xs_stream(
            smooth_yz(x * mf), smooth_yz(mf), m, sigma, SPACING,
            interpret=True, **kw)), 0, -1,
    )


def test_xs_stream_matches_ops_f64():
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((16, 16, 16), seed=5, dtype=jnp.float64).data
    mask = sphere_mask((16, 16, 16), 0.45).data
    want = np.asarray(features8(x, mask, 1.1, SPACING))
    got = _xs_stream(x, mask, 1.1)
    outside = np.asarray(mask) == 0
    assert np.all(got[outside] == 0)
    _features8_channel_parity(got, want, 1e-7)


def test_xs_stream_radius_larger_than_volume():
    # every ring slot is boundary-fed; seeding + tail re-reads must
    # reproduce clamp smoothing of the y/z-smoothed field exactly
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((16, 16, 16), seed=6, dtype=jnp.float64).data
    mask = sphere_mask((16, 16, 16), 0.45).data
    want = np.asarray(features8(x, mask, 2.5, SPACING))
    _features8_channel_parity(_xs_stream(x, mask, 2.5), want, 1e-7)


def test_xs_stream_prime_extents_and_blocks():
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((13, 11, 16), seed=7, dtype=jnp.float64).data
    mask = sphere_mask((13, 11, 16), 0.45).data
    want = np.asarray(features8(x, mask, 0.9, SPACING))
    for blk in (1, 2, 4):
        _features8_channel_parity(_xs_stream(x, mask, 0.9, block=blk),
                                  want, 1e-7)


# ---------------------------------------------------------------------------
# fused_features8_ys_multi (multi-scale: in-kernel banded MXU y smoothing
# + divide + chain, all scales one pass)
# ---------------------------------------------------------------------------


def _ys_multi(x, mask, sigmas):
    from ife_tpu.ops.features import multiscale_features8_fused

    out = multiscale_features8_fused(x, mask, sigmas, SPACING,
                                     interpret=True, stack=True)
    # (S, 8, X, Y, Z) -> (S, X, Y, Z, 8)
    return np.moveaxis(np.asarray(out), 1, -1)


def test_ys_multi_matches_ops_f64():
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((16, 16, 16), seed=5, dtype=jnp.float64).data
    mask = sphere_mask((16, 16, 16), 0.45).data
    sigmas = (0.9, 1.8)
    got = _ys_multi(x, mask, sigmas)
    for si, s in enumerate(sigmas):
        want = np.asarray(features8(x, mask, s, SPACING))
        outside = np.asarray(mask) == 0
        assert np.all(got[si][outside] == 0)
        _features8_channel_parity(got[si], want, 1e-7)


def test_ys_multi_radius_larger_than_volume():
    # band matrix wider than Y: the dense-dot branch of _banded_dot
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((16, 16, 16), seed=6, dtype=jnp.float64).data
    mask = sphere_mask((16, 16, 16), 0.45).data
    want = np.asarray(features8(x, mask, 2.5, SPACING))
    _features8_channel_parity(_ys_multi(x, mask, (2.5,))[0], want, 1e-7)


def test_ys_multi_unaligned_y():
    """TPU pads Y up to the sublane multiple BEFORE the in-kernel y
    smoothing; the clamp-folded band matrix must make the padded
    columns exactly s(Y-1) so the stencil's last true column reads the
    ZeroFluxNeumann value (review finding: building W for the padded
    extent produced smoothing-at-virtual-position there). pad_to forces
    the padding path under the interpreter."""
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.kernels.fused import fused_features8_ys_multi
    from ife_tpu.ops.features import features8
    from ife_tpu.ops.stencil import gaussian_smooth_axis

    shape = (14, 13, 16)  # Y=13: pads to 16 under pad_to
    x = synthetic_ct(shape, seed=11, dtype=jnp.float64).data
    mask = sphere_mask(shape, 0.45).data
    m = jnp.clip(mask, 0, 1)
    mf = m.astype(x.dtype)
    sig = 1.2

    def sxz(v):
        v = gaussian_smooth_axis(v, 0, sig, SPACING[0])
        return gaussian_smooth_axis(v, 2, sig, SPACING[2])

    got = np.asarray(fused_features8_ys_multi(
        (sxz(x * mf),), (sxz(mf),), m, (sig,), SPACING, interpret=True,
        stack=True, pad_to=(16, 16)))[0]
    want = np.asarray(features8(x, mask, sig, SPACING))
    _features8_channel_parity(np.moveaxis(got, 0, -1), want, 1e-7)


def test_ys_multi_prime_extents():
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.ops.features import features8

    x = synthetic_ct((13, 11, 16), seed=7, dtype=jnp.float64).data
    mask = sphere_mask((13, 11, 16), 0.45).data
    got = _ys_multi(x, mask, (0.9, 1.4))
    for si, s in enumerate((0.9, 1.4)):
        want = np.asarray(features8(x, mask, s, SPACING))
        _features8_channel_parity(got[si], want, 1e-7)


def test_sweep_multi_matches_per_scale():
    """The shared-ring multi-scale sweep must match the single-device op
    per scale (shared lag/rings sized by the largest radius must retain
    every row the smaller radius reads)."""
    import jax.numpy as jnp

    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.kernels.fused import fused_features8_sweep_multi
    from ife_tpu.ops.features import features8

    x = synthetic_ct((16, 16, 16), seed=5, dtype=jnp.float64).data
    mask = sphere_mask((16, 16, 16), 0.45).data
    sigmas = (0.7, 1.4)
    got = np.asarray(fused_features8_sweep_multi(
        x, mask, sigmas, SPACING, interpret=True, stack=True))
    for si, s in enumerate(sigmas):
        want = np.asarray(features8(x, mask, s, SPACING))
        a = np.moveaxis(got[si], 0, -1)
        outside = np.asarray(mask) == 0
        assert np.all(a[outside] == 0)
        _features8_channel_parity(a, want, 1e-7)
    # prime extents + multi-row blocks
    xq = synthetic_ct((13, 11, 16), seed=7, dtype=jnp.float64).data
    mq = sphere_mask((13, 11, 16), 0.45).data
    for blk in (1, 2):
        g = np.asarray(fused_features8_sweep_multi(
            xq, mq, (0.9, 1.3), SPACING, block=blk, interpret=True,
            stack=True))
        for si, s in enumerate((0.9, 1.3)):
            want = np.asarray(features8(xq, mq, s, SPACING))
            _features8_channel_parity(np.moveaxis(g[si], 0, -1), want,
                                      1e-7)


def test_sweep_unaligned_z():
    """TPU pads Z up to the lane multiple BEFORE the sweep kernels'
    in-kernel smoothing; the stencil's last true z plane must clamp to
    the smoothed field (s(Z) := s(Z-1)), not consume the padded plane's
    smoothing-at-virtual-position (second-review finding: up to ~117%
    derivative error there). pad_to forces the padding path under the
    interpreter; covers the single- and multi-scale sweeps."""
    import jax.numpy as jnp

    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.kernels.fused import (
        fused_features8_sweep, fused_features8_sweep_multi,
    )
    from ife_tpu.ops.features import features8

    shape = (14, 16, 13)  # Z=13: pads to 16 under pad_to
    x = synthetic_ct(shape, seed=12, dtype=jnp.float64).data
    mask = sphere_mask(shape, 0.45).data
    want = np.asarray(features8(x, mask, 1.1, SPACING))
    got = np.moveaxis(np.asarray(fused_features8_sweep(
        x, mask, 1.1, SPACING, interpret=True, pad_to=(16, 16))), 0, -1)
    _features8_channel_parity(got, want, 1e-7)
    gm = np.asarray(fused_features8_sweep_multi(
        x, mask, (0.8, 1.1), SPACING, interpret=True, stack=True,
        pad_to=(16, 16)))
    for si, s in enumerate((0.8, 1.1)):
        w = np.asarray(features8(x, mask, s, SPACING))
        _features8_channel_parity(np.moveaxis(gm[si], 0, -1), w, 1e-7)


def test_sweep_halo_extended_clamps():
    """The sharded block-sweep composition: a halo-extended block (edge
    replication at true faces, as halo_exchange produces on a boundary
    shard) swept with DYNAMIC true-face clamp rows must match the
    single-device op on the kept core. Without the clamps the stencil
    reads smooth(replicated-raw) at the true-face phantoms — 35-50%
    error on the derivative channels in the outermost layers (the
    round-5 on-chip verify gate caught it; r5_probe22)."""
    import math

    import jax.numpy as jnp

    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.kernels.fused import fused_features8_sweep
    from ife_tpu.ops.features import features8

    shape = (20, 18, 16)
    x = synthetic_ct(shape, seed=9, dtype=jnp.float64).data
    mask = sphere_mask(shape, 0.45).data.astype(jnp.float64)
    sigma = 1.0
    rx = max(1, math.ceil(4.5 * sigma / SPACING[0]))
    ry = max(1, math.ceil(4.5 * sigma / SPACING[1]))
    want = np.asarray(features8(x, mask, sigma, SPACING))

    # x-extended (1D-sharded boundary shard on both sides)
    r = rx + 1
    xe = jnp.pad(x, ((r, r), (0, 0), (0, 0)), mode="edge")
    me = jnp.pad(mask, ((r, r), (0, 0), (0, 0)), mode="edge")
    out = fused_features8_sweep(
        xe, me, sigma, SPACING, stack=False, interpret=True,
        clamps=jnp.asarray([r, r + shape[0] - 1, 0, shape[1] - 1],
                           jnp.int32))
    got = np.stack([np.asarray(o[r:r + shape[0]]) for o in out], -1)
    _features8_channel_parity(got, want, 1e-7)

    # x+y-extended (2D-mesh corner shard)
    q = ry + 1
    xe2 = jnp.pad(x, ((r, r), (q, q), (0, 0)), mode="edge")
    me2 = jnp.pad(mask, ((r, r), (q, q), (0, 0)), mode="edge")
    out2 = fused_features8_sweep(
        xe2, me2, sigma, SPACING, stack=False, interpret=True,
        clamps=jnp.asarray([r, r + shape[0] - 1, q, q + shape[1] - 1],
                           jnp.int32))
    got2 = np.stack(
        [np.asarray(o[r:r + shape[0], q:q + shape[1]]) for o in out2], -1)
    _features8_channel_parity(got2, want, 1e-7)


def test_post_stream_matches_windowed_post():
    """The streaming post-smoothing kernel vs the windowed one vs the
    composed op, plain and pre_padded, including prime extents."""
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.kernels.fused import (
        fused_features8_post, fused_features8_post_stream,
    )
    from ife_tpu.ops.stencil import gaussian_smooth

    for shape in [(16, 16, 16), (13, 11, 16)]:
        x = synthetic_ct(shape, seed=12, dtype=jnp.float64).data
        m = sphere_mask(shape, 0.45).data
        s = gaussian_smooth(x, 1.0, SPACING)
        want = np.moveaxis(np.asarray(
            fused_features8_post(s, m, SPACING, interpret=True)), 0, -1)
        got = np.moveaxis(np.asarray(
            fused_features8_post_stream(s, m, SPACING, interpret=True)),
            0, -1)
        for c in (0, 1):
            sc = max(np.abs(want[..., c]).max(), 1.0)
            assert np.abs(got[..., c] - want[..., c]).max() / sc < 1e-9, c
        _assert_feature_parity(got[..., 2:], want[..., 2:], rtol=1e-9)
        # pre_padded: a halo-extended block must reproduce the core
        sp = jnp.pad(s, ((1, 1), (1, 1), (0, 0)), mode="edge")
        gp = np.moveaxis(np.asarray(fused_features8_post_stream(
            sp, m, SPACING, interpret=True, pre_padded=True)), 0, -1)
        for c in (0, 1):
            sc = max(np.abs(want[..., c]).max(), 1.0)
            assert np.abs(gp[..., c] - want[..., c]).max() / sc < 1e-9, c
        _assert_feature_parity(gp[..., 2:], want[..., 2:], rtol=1e-9)


def test_stream_kernel_extended_block_slice_trick():
    """The sharded wrapper runs the STREAM kernel on a halo-extended
    block and slices the core (no pre_padded flag needed): interior
    outputs must equal the unextended kernel's on the true core, because
    the kernel's own edge clamps only touch the sliced-away border."""
    from ife_tpu.kernels.fused import fused_hessian_eig_stream

    x = synthetic_ct((12, 10, 16), seed=13, dtype=jnp.float64).data
    want = _want(x)
    ext = jnp.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")
    out = fused_hessian_eig_stream(ext, SPACING, block=2, interpret=True,
                                   stack=False)
    got = np.stack([np.asarray(o)[1:-1, 1:-1, :] for o in out], axis=-1)
    _assert_feature_parity(got, want, rtol=1e-9)


def test_stream_kernel_x_halo_rows():
    """x_halo row inputs (the zero-copy sharded path): computing two x
    halves with each other's boundary rows as halo must reproduce the
    full-volume kernel exactly — including a non-block-divisible half."""
    from ife_tpu.kernels.fused import fused_hessian_eig_stream

    for X in (12, 14):  # 14/2=7: odd halves exercise the concat fallback
        x = synthetic_ct((X, 10, 16), seed=14, dtype=jnp.float64).data
        want = np.stack([np.asarray(o) for o in fused_hessian_eig_stream(
            x, SPACING, block=2, interpret=True, stack=False)], -1)
        h = X // 2
        lo_half = fused_hessian_eig_stream(
            x[:h], SPACING, block=2, interpret=True, stack=False,
            x_halo=(x[:1], x[h:h + 1]))
        hi_half = fused_hessian_eig_stream(
            x[h:], SPACING, block=2, interpret=True, stack=False,
            x_halo=(x[h - 1:h], x[-1:]))
        got = np.concatenate([
            np.stack([np.asarray(o) for o in lo_half], -1),
            np.stack([np.asarray(o) for o in hi_half], -1),
        ], axis=0)
        _assert_feature_parity(got, want, rtol=1e-12)


def test_post_stream_x_halo_rows():
    """x_halo on the post kernel: two x halves with each other's boundary
    rows must reproduce the full-volume result exactly."""
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.kernels.fused import fused_features8_post_stream
    from ife_tpu.ops.stencil import gaussian_smooth

    x = synthetic_ct((14, 10, 16), seed=15, dtype=jnp.float64).data
    m = sphere_mask((14, 10, 16), 0.45).data
    s = gaussian_smooth(x, 1.0, SPACING)
    want = np.moveaxis(np.asarray(fused_features8_post_stream(
        s, m, SPACING, interpret=True)), 0, -1)
    h = 7
    halves = []
    for sl, halo in (
        (slice(0, h), (s[:1], s[h:h + 1])),
        (slice(h, None), (s[h - 1:h], s[-1:])),
    ):
        out = fused_features8_post_stream(
            s[sl], m[sl], SPACING, interpret=True, x_halo=halo)
        halves.append(np.moveaxis(np.asarray(out), 0, -1))
    got = np.concatenate(halves, axis=0)
    for c in (0, 1):
        sc = max(np.abs(want[..., c]).max(), 1.0)
        assert np.abs(got[..., c] - want[..., c]).max() / sc < 1e-12, c
    _assert_feature_parity(got[..., 2:], want[..., 2:], rtol=1e-12)


def test_nc_sweep_tiled_matches_untiled():
    """Y-tiled sweep assembly must be exactly the untiled result: kept
    rows never touch a tile-edge clamp (radius-extended slabs), true
    edges stay true edges."""
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.kernels.fused import (
        fused_normalized_conv_sweep, fused_normalized_conv_sweep_tiled,
    )

    for shape, sigma, n_tiles in [((12, 17, 16), 1.3, 2),
                                  ((10, 23, 16), 2.1, 3)]:
        x = synthetic_ct(shape, seed=10, dtype=jnp.float64).data
        m = sphere_mask(shape, 0.45).data.astype(jnp.float64)
        want = np.asarray(fused_normalized_conv_sweep(
            x, m, sigma, SPACING, interpret=True))
        got = np.asarray(fused_normalized_conv_sweep_tiled(
            x, m, sigma, SPACING, n_tiles=n_tiles, interpret=True))
        inside = np.asarray(m) > 0
        assert np.array_equal(got[inside], want[inside]), (shape, sigma)


def test_nc_sweep_matches_staged_normalized_conv():
    # the smoothing-only line sweep vs the staged separable path; compare
    # inside the mask support (the no-epsilon divide is nan outside in
    # BOTH, like the reference)
    from ife_tpu.core.volume import sphere_mask
    from ife_tpu.kernels.fused import fused_normalized_conv_sweep
    from ife_tpu.ops.stencil import normalized_gaussian_convolution

    for shape, sigma in [((16, 16, 16), 1.1), ((13, 11, 16), 0.9),
                         ((16, 16, 16), 2.5)]:
        x = synthetic_ct(shape, seed=9, dtype=jnp.float64).data
        m = sphere_mask(shape, 0.45).data.astype(jnp.float64)
        got = np.asarray(fused_normalized_conv_sweep(
            x, m, sigma, SPACING, interpret=True))
        want = np.asarray(normalized_gaussian_convolution(
            x, m, sigma, SPACING))
        inside = np.asarray(m) > 0
        assert np.abs(got - want)[inside].max() < 1e-9, (shape, sigma)
