"""Round-5 probe C: MXU precision policy for the Gaussian contractions.

HIGHEST (6-pass bf16 decomposition of f32) was the conservative round-1
choice for every band einsum and for the in-kernel ys matmuls. The
3-pass HIGH halves MXU work; this probe measures (a) the actual
accuracy delta against HIGHEST on CT-scaled data, (b) the staged
features8 pass at 512^3 sigma=4.8 under both, (c) the ys kernel and the
config-3 composition under HIGH.

Run AFTER probe19 (shared chip): PYTHONPATH=... python benchmarks/probe20.py
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
                   "r5_probe20.json")
SPC = (0.78, 0.78, 1.0)


def set_precision(p):
    import ife_tpu.ops.stencil as st

    st.MATMUL_PRECISION = p
    jax.clear_caches()
    # jitted wrappers in fused.py / features.py bake the precision at
    # trace time; clear_caches forces retrace. lru_cached shard_map
    # wrappers are not touched here (not measured in this probe).


def main():
    out = {"device": jax.devices()[0].device_kind}
    attempt = make_attempt(out, OUT)

    from ife_tpu.kernels.fused import (
        fused_features8, fused_features8_post_stream,
    )
    from ife_tpu.ops.stencil import normalized_gaussian_convolution
    from ife_tpu.ops.features import multiscale_features8_fused

    key = jax.random.PRNGKey(0)
    shape5 = (512, 512, 512)
    x5 = jax.random.normal(key, shape5, jnp.float32) * 200.0 - 600.0
    m5 = (jax.random.uniform(jax.random.PRNGKey(2), shape5) > 0.25).astype(
        jnp.float32)
    shape3 = (256, 256, 256)
    x3 = jax.random.normal(key, shape3, jnp.float32) * 200.0 - 600.0
    m3 = (jax.random.uniform(jax.random.PRNGKey(1), shape3) > 0.25).astype(
        jnp.float32)

    # (a) accuracy: smoothing at HIGH vs HIGHEST on CT-scaled data
    def acc():
        v = x3[:128, :128, :128]
        c = m3[:128, :128, :128]
        set_precision(jax.lax.Precision.HIGHEST)
        ref = np.asarray(normalized_gaussian_convolution(v, c, 4.8, SPC))
        set_precision(jax.lax.Precision.HIGH)
        got = np.asarray(normalized_gaussian_convolution(v, c, 4.8, SPC))
        inside = np.asarray(c) != 0
        sc = np.abs(ref[inside]).max()
        return {"rel_err_smooth_s4.8": float(
            np.abs((got - ref)[inside]).max() / sc)}

    attempt("high_vs_highest_accuracy", acc)

    def staged_scale(v, mm, sigma):
        return fused_features8(v, mm, sigma, SPC, stack=False)[0]

    # (b) staged 512^3 sigma=4.8 under both precisions
    for prec, tag in ((jax.lax.Precision.HIGHEST, "highest"),
                      (jax.lax.Precision.HIGH, "high")):
        set_precision(prec)
        attempt(f"staged512_s4.8_{tag}_ms", lambda: round(loop_time(
            lambda v, mm: staged_scale(v, mm, 4.8), x5, m5,
            inner=12) * 1e3, 3))

    # (c) ys + config3 under HIGH
    set_precision(jax.lax.Precision.HIGH)

    def ys1(v, mm):
        return multiscale_features8_fused(v, mm, (4.8,), SPC,
                                          stack=False)[0][0]

    attempt("ys512_s4.8_high_ms", lambda: round(loop_time(
        ys1, x5, m5, inner=12) * 1e3, 3))

    scales = (0.6, 1.2, 2.4, 4.8)

    def multi_ys(v, mm):
        g = multiscale_features8_fused(v, mm, scales, SPC, stack=False)
        return jnp.stack([g[s][0] for s in range(4)], 0).sum(0)

    attempt("multi4_ys_high_256_ms", lambda: round(loop_time(
        multi_ys, x3, m3, inner=16) * 1e3, 3))
    if isinstance(out.get("multi4_ys_high_256_ms"), float):
        out["config3_ys_high_gvox_s"] = round(
            4 * float(np.prod(shape3)) / out["multi4_ys_high_256_ms"] / 1e6,
            3)

    # hybrid under HIGH (sweeps are tap kernels — precision-independent)
    from ife_tpu.kernels.fused import fused_features8_sweep

    def multi_hybrid(v, mm):
        outs = [fused_features8_sweep(v, mm, s, SPC, stack=False)[0]
                for s in (0.6, 1.2)]
        g = multiscale_features8_fused(v, mm, (2.4, 4.8), SPC,
                                       stack=False)
        outs += [g[0][0], g[1][0]]
        return jnp.stack(outs, 0).sum(0)

    attempt("multi4_hybrid_high_256_ms", lambda: round(loop_time(
        multi_hybrid, x3, m3, inner=16) * 1e3, 3))
    if isinstance(out.get("multi4_hybrid_high_256_ms"), float):
        out["config3_hybrid_high_gvox_s"] = round(
            4 * float(np.prod(shape3))
            / out["multi4_hybrid_high_256_ms"] / 1e6, 3)

    # xs under HIGH at 256^3 (its y/z einsums speed up too)
    from ife_tpu.kernels.fused import fused_features8_xs_stream
    from ife_tpu.ops.stencil import gaussian_smooth_axis

    def xs_scale(v, mm, sigma):
        mc = jnp.clip(mm, 0, 1)
        mf = mc.astype(v.dtype)

        def syz(u):
            u = gaussian_smooth_axis(u, 1, sigma, SPC[1])
            return gaussian_smooth_axis(u, 2, sigma, SPC[2])

        return fused_features8_xs_stream(
            syz(v * mf), syz(mf), mc, sigma, SPC, stack=False)[0]

    def multi_xs_mix(v, mm):
        outs = [fused_features8_sweep(v, mm, s, SPC, stack=False)[0]
                for s in (0.6, 1.2)]
        outs.append(xs_scale(v, mm, 2.4))
        outs.append(staged_scale(v, mm, 4.8))
        return jnp.stack(outs, 0).sum(0)

    attempt("multi4_xsmix_high_256_ms", lambda: round(loop_time(
        multi_xs_mix, x3, m3, inner=16) * 1e3, 3))
    if isinstance(out.get("multi4_xsmix_high_256_ms"), float):
        out["config3_xsmix_high_gvox_s"] = round(
            4 * float(np.prod(shape3))
            / out["multi4_xsmix_high_256_ms"] / 1e6, 3)


if __name__ == "__main__":
    main()
