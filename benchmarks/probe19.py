"""Round-5 probe B: the in-kernel-MXU ys kernel on chip.

Questions:
  1. VERDICT next-3 target: sigma=4.8 at 512^3 via x/z einsums + the
     S=1 ys kernel vs the staged path's 30.1 ms (goal <= ~20 ms).
  2. config 3: all four scales through multiscale_features8_fused (one
     Pallas launch) at 256^3 — goal >= ~8 Gvox/s.
  3. xs-stream block sensitivity at 256^3 (launch-overhead check).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe19.py
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
                   "r5_probe19.json")
SPC = (0.78, 0.78, 1.0)


def main():
    out = {"device": jax.devices()[0].device_kind}
    attempt = make_attempt(out, OUT)

    from ife_tpu.ops.features import multiscale_features8_fused
    from ife_tpu.kernels.fused import fused_features8_xs_stream
    from ife_tpu.ops.stencil import gaussian_smooth_axis

    key = jax.random.PRNGKey(0)

    # --- 512^3 single-scale sigma=4.8 (the VERDICT #3 number) ---
    shape5 = (512, 512, 512)
    x5 = jax.random.normal(key, shape5, jnp.float32) * 200.0 - 600.0
    m5 = (jax.random.uniform(jax.random.PRNGKey(2), shape5) > 0.25).astype(
        jnp.float32)

    def ys1(v, mm, sig):
        return multiscale_features8_fused(v, mm, (sig,), SPC,
                                          stack=False)[0][0]

    attempt("ys512_s4.8_ms", lambda: round(loop_time(
        lambda v, mm: ys1(v, mm, 4.8), x5, m5, inner=12) * 1e3, 3))

    # parity on chip right away (small shape): ys vs XLA-composed ops
    def parity():
        from ife_tpu.ops.features import features8

        shape = (128, 128, 128)
        v = jax.random.normal(key, shape, jnp.float32) * 200.0 - 600.0
        mm = (jax.random.uniform(jax.random.PRNGKey(1), shape) > 0.25
              ).astype(jnp.float32)

        @jax.jit
        def errs(v, mm):
            got = multiscale_features8_fused(v, mm, (2.4, 4.8), SPC,
                                             stack=True)
            res = {}
            for si, s in enumerate((2.4, 4.8)):
                b = features8(v, mm, s, SPC)
                a = jnp.moveaxis(got[si], 0, -1)
                scale = jnp.maximum(
                    jnp.abs(b).reshape(-1, 8).max(axis=0), 1.0)
                d = jnp.abs(a - b).reshape(-1, 8).max(axis=0) / scale
                res[f"s{s}_smoothed"] = d[0]
                res[f"s{s}_frobenius"] = d[7]
                ea = jnp.sort(a[..., 2:5], -1)
                eb = jnp.sort(b[..., 2:5], -1)
                res[f"s{s}_eig_sorted"] = jnp.abs(ea - eb).max() / \
                    jnp.maximum(jnp.abs(eb).max(), 1.0)
            return res

        return {k: float(v) for k, v in errs(v, mm).items()}

    attempt("ys_parity_128", parity)

    # --- config 3: 4 scales, one launch, 256^3 ---
    shape3 = (256, 256, 256)
    x3 = jax.random.normal(key, shape3, jnp.float32) * 200.0 - 600.0
    m3 = (jax.random.uniform(jax.random.PRNGKey(1), shape3) > 0.25).astype(
        jnp.float32)
    scales = (0.6, 1.2, 2.4, 4.8)

    def multi_ys(v, mm):
        g = multiscale_features8_fused(v, mm, scales, SPC, stack=False)
        return jnp.stack([g[s][0] for s in range(4)], 0).sum(0)

    attempt("multi4_ys_256_ms", lambda: round(loop_time(
        multi_ys, x3, m3, inner=16) * 1e3, 3))
    if isinstance(out.get("multi4_ys_256_ms"), float):
        out["config3_ys_gvox_s"] = round(
            4 * float(np.prod(shape3)) / out["multi4_ys_256_ms"] / 1e6, 3)

    # hybrid: sweeps for the two small scales + 2-scale ys for the big
    from ife_tpu.kernels.fused import fused_features8_sweep

    def multi_hybrid(v, mm):
        outs = [fused_features8_sweep(v, mm, s, SPC, stack=False)[0]
                for s in (0.6, 1.2)]
        g = multiscale_features8_fused(v, mm, (2.4, 4.8), SPC,
                                       stack=False)
        outs += [g[0][0], g[1][0]]
        return jnp.stack(outs, 0).sum(0)

    attempt("multi4_hybrid_256_ms", lambda: round(loop_time(
        multi_hybrid, x3, m3, inner=16) * 1e3, 3))
    if isinstance(out.get("multi4_hybrid_256_ms"), float):
        out["config3_hybrid_gvox_s"] = round(
            4 * float(np.prod(shape3)) / out["multi4_hybrid_256_ms"] / 1e6,
            3)

    # --- xs block sensitivity at 256^3 sigma=2.4 ---
    def xs_scale(v, mm, sigma, blk):
        mc = jnp.clip(mm, 0, 1)
        mf = mc.astype(v.dtype)

        def syz(u):
            u = gaussian_smooth_axis(u, 1, sigma, SPC[1])
            return gaussian_smooth_axis(u, 2, sigma, SPC[2])

        return fused_features8_xs_stream(
            syz(v * mf), syz(mf), mc, sigma, SPC, block=blk,
            stack=False)[0]

    for blk in (2, 4):
        attempt(f"xs256_s2.4_b{blk}_ms", lambda b=blk: round(loop_time(
            lambda v, mm: xs_scale(v, mm, 2.4, b), x3, m3,
            inner=32) * 1e3, 3))


if __name__ == "__main__":
    main()
