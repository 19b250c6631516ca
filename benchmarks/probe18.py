"""Round-5 probe A: the xs-stream staged tail and the arithmetic/MXU
fine histogram on chip.

Questions:
  1. config-3 components at 256^3: per-scale time of the NEW dispatch
     (sweep for sigma 0.6/1.2, yz-einsum + xs-stream for 2.4/4.8) vs the
     round-4 dispatch (sweep + einsum+post_stream), and the 4-scale
     one-jit composition both ways.
  2. 512^3 staged tail at sigma where the xs rings fit vs post_stream.
  3. uniform_histogram_counts (4096 bins) at 512^3 vs the round-4
     33-pass compare-reduce kernel (285-397 ms/channel).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe18.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks._timing import loop_time, make_attempt  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out",
                   "r5_probe18.json")
SPC = (0.78, 0.78, 1.0)


def main():
    out = {"device": jax.devices()[0].device_kind}
    attempt = make_attempt(out, OUT)

    from ife_tpu.kernels.fused import (
        fused_features8, fused_features8_post_stream,
        fused_features8_sweep, fused_features8_xs_stream, _xs_stream_fits,
    )
    from ife_tpu.ops.stencil import (
        gaussian_smooth_axis, normalized_gaussian_convolution,
    )

    key = jax.random.PRNGKey(0)
    shape = (256, 256, 256)
    x = jax.random.normal(key, shape, jnp.float32) * 200.0 - 600.0
    m = (jax.random.uniform(jax.random.PRNGKey(1), shape) > 0.25).astype(
        jnp.float32)

    def xs_scale(v, mm, sigma):
        mc = jnp.clip(mm, 0, 1)
        mf = mc.astype(v.dtype)

        def syz(u):
            u = gaussian_smooth_axis(u, 1, sigma, SPC[1])
            return gaussian_smooth_axis(u, 2, sigma, SPC[2])

        return fused_features8_xs_stream(
            syz(v * mf), syz(mf), mc, sigma, SPC, stack=False)

    def staged_scale(v, mm, sigma):
        mc = jnp.clip(mm, 0, 1)
        s = normalized_gaussian_convolution(
            v, mc.astype(v.dtype), sigma, SPC)
        return fused_features8_post_stream(s, mc, SPC, stack=False)

    # per-scale components at 256^3
    for sig in (2.4, 4.8):
        assert _xs_stream_fits(sig, SPC, shape), sig
        attempt(f"xs256_s{sig}_ms", lambda s=sig: round(loop_time(
            lambda v, mm: xs_scale(v, mm, s)[0], x, m, inner=32) * 1e3, 3))
        attempt(f"staged256_s{sig}_ms", lambda s=sig: round(loop_time(
            lambda v, mm: staged_scale(v, mm, s)[0], x, m, inner=32) * 1e3,
            3))
    for sig in (0.6, 1.2):
        attempt(f"sweep256_s{sig}_ms", lambda s=sig: round(loop_time(
            lambda v, mm: fused_features8_sweep(v, mm, s, SPC,
                                                stack=False)[0],
            x, m, inner=32) * 1e3, 3))
        attempt(f"xs256_s{sig}_ms", lambda s=sig: round(loop_time(
            lambda v, mm: xs_scale(v, mm, s)[0], x, m, inner=32) * 1e3, 3))

    # 4-scale one-jit composition: round-4 dispatch vs new dispatch
    scales = (0.6, 1.2, 2.4, 4.8)

    def multi_new(v, mm):
        outs = []
        for s in scales:
            k = (fused_features8_sweep(v, mm, s, SPC, stack=False)
                 if s <= 1.3 else xs_scale(v, mm, s))
            outs.append(k[0])
        return jnp.stack(outs, 0).sum(0)

    def multi_old(v, mm):
        outs = []
        for s in scales:
            k = (fused_features8_sweep(v, mm, s, SPC, stack=False)
                 if s <= 1.3 else staged_scale(v, mm, s))
            outs.append(k[0])
        return jnp.stack(outs, 0).sum(0)

    attempt("multi4_new_256_ms", lambda: round(loop_time(
        multi_new, x, m, inner=12) * 1e3, 3))
    attempt("multi4_old_256_ms", lambda: round(loop_time(
        multi_old, x, m, inner=12) * 1e3, 3))
    vox4 = 4 * float(np.prod(shape))
    if isinstance(out.get("multi4_new_256_ms"), float):
        out["config3_new_gvox_s"] = round(
            vox4 / out["multi4_new_256_ms"] / 1e6, 3)
    if isinstance(out.get("multi4_old_256_ms"), float):
        out["config3_old_gvox_s"] = round(
            vox4 / out["multi4_old_256_ms"] / 1e6, 3)

    # 512^3: the staged tail where the rings fit (rx<=9 -> sigma<=1.5)
    shape5 = (512, 512, 512)
    x5 = jax.random.normal(key, shape5, jnp.float32) * 200.0 - 600.0
    m5 = (jax.random.uniform(jax.random.PRNGKey(2), shape5) > 0.25).astype(
        jnp.float32)
    if _xs_stream_fits(1.4, SPC, shape5):
        attempt("xs512_s1.4_ms", lambda: round(loop_time(
            lambda v, mm: xs_scale(v, mm, 1.4)[0], x5, m5,
            inner=12) * 1e3, 3))
        attempt("staged512_s1.4_ms", lambda: round(loop_time(
            lambda v, mm: staged_scale(v, mm, 1.4)[0], x5, m5,
            inner=12) * 1e3, 3))

    # fine histogram at 512^3: arithmetic/MXU vs 33-pass compare-reduce
    from ife_tpu.stats.histogram import (
        snap_pow2_grid, uniform_histogram_counts,
    )
    from ife_tpu.kernels.histogram import histogram_counts_pallas

    w01 = (m5 != 0).astype(jnp.int32).ravel()
    snapped = snap_pow2_grid(-1100.0, 500.0, 4096)
    assert snapped is not None
    mm_, kk_, bounds = snapped

    def fine_mxu(v, w, mf, wf):
        # loop-carry through the scalar grid param (cannot be folded)
        c = uniform_histogram_counts(
            v, w, mf + v.reshape(-1)[0] * jnp.asarray(0.0, jnp.float32), wf,
            4096)
        return v + c.sum().astype(v.dtype) * jnp.asarray(0.0, v.dtype)

    attempt("fine_mxu_4096_512_ms", lambda: round(loop_time(
        fine_mxu, x5, w01, jnp.float32(mm_),
        jnp.float32(np.ldexp(1.0, kk_)), inner=12) * 1e3, 3))

    edges = jnp.asarray(bounds, jnp.float32)

    def fine_cmp(v, w, e):
        e_t = e + v.reshape(-1)[0] * jnp.asarray(0.0, jnp.float32)
        c = histogram_counts_pallas(v.ravel(), e_t, w)
        return v + c.sum().astype(v.dtype) * jnp.asarray(0.0, v.dtype)

    attempt("fine_cmp_4097e_512_ms", lambda: round(loop_time(
        fine_cmp, x5, w01, edges, inner=4) * 1e3, 3))

    # exactness on chip: MXU binning vs the compare-reduce kernel on the
    # SAME snapped grid (integer equality)
    def check():
        a = np.asarray(uniform_histogram_counts(
            x5, w01, jnp.float32(mm_), jnp.float32(np.ldexp(1.0, kk_)),
            4096)).astype(np.int64)
        raw = np.asarray(histogram_counts_pallas(
            x5.ravel(), edges, w01)).astype(np.int64)
        b = raw[1:4097].copy()
        b[0] += raw[0]
        return {"max_abs_diff": int(np.abs(a - b).max()),
                "total": int(a.sum())}

    attempt("fine_mxu_vs_cmp_exact", check)


if __name__ == "__main__":
    main()
