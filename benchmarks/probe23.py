"""Round-5 probe F: the shared-ring multi-scale sweep on chip.

  1. dual-sweep (0.6, 1.2) at 256^3 vs two separate sweep launches.
  2. config-3 compositions: dual-sweep + xs(2.4) + staged(4.8), and
     dual-sweep + ys-dual(2.4, 4.8) — 3 vs 2 launches for 4 scales.
  3. on-chip parity of the dual sweep (both scales, 128^3).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe23.py
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
                   "r5_probe23.json")
SPC = (0.78, 0.78, 1.0)


def main():
    out = {"device": jax.devices()[0].device_kind}
    attempt = make_attempt(out, OUT)

    from ife_tpu.kernels.fused import (
        fused_features8, fused_features8_sweep, fused_features8_sweep_multi,
        fused_features8_xs_stream,
    )
    from ife_tpu.ops.features import multiscale_features8_fused
    from ife_tpu.ops.stencil import gaussian_smooth_axis

    key = jax.random.PRNGKey(0)
    shape3 = (256, 256, 256)
    x3 = jax.random.normal(key, shape3, jnp.float32) * 200.0 - 600.0
    m3 = (jax.random.uniform(jax.random.PRNGKey(1), shape3) > 0.25).astype(
        jnp.float32)

    # parity first (small shape): both scales vs the XLA op
    def parity():
        from ife_tpu.ops.features import features8

        shape = (128, 128, 128)
        v = jax.random.normal(key, shape, jnp.float32) * 200.0 - 600.0
        mm = (jax.random.uniform(jax.random.PRNGKey(1), shape) > 0.25
              ).astype(jnp.float32)

        @jax.jit
        def errs(v, mm):
            g = fused_features8_sweep_multi(v, mm, (0.6, 1.2), SPC,
                                            stack=True)
            res = {}
            for si, s in enumerate((0.6, 1.2)):
                b = features8(v, mm, s, SPC)
                a = jnp.moveaxis(g[si], 0, -1)
                scale = jnp.maximum(
                    jnp.abs(b).reshape(-1, 8).max(axis=0), 1.0)
                d = jnp.abs(a - b).reshape(-1, 8).max(axis=0) / scale
                ea = jnp.sort(a[..., 2:5], -1)
                eb = jnp.sort(b[..., 2:5], -1)
                res[f"s{s}"] = jnp.maximum(
                    jnp.max(d[jnp.array([0, 1, 5, 6, 7])]),
                    jnp.abs(ea - eb).max()
                    / jnp.maximum(jnp.abs(eb).max(), 1.0))
            return res

        return {k: float(v) for k, v in errs(v, mm).items()}

    attempt("sweep_multi_parity_128", parity)

    def dual(v, mm):
        g = fused_features8_sweep_multi(v, mm, (0.6, 1.2), SPC,
                                        stack=False)
        return g[0][0] + g[1][0]

    def two_sweeps(v, mm):
        a = fused_features8_sweep(v, mm, 0.6, SPC, stack=False)[0]
        b = fused_features8_sweep(v, mm, 1.2, SPC, stack=False)[0]
        return a + b

    attempt("dual_sweep_256_ms", lambda: round(loop_time(
        dual, x3, m3, inner=32) * 1e3, 3))
    attempt("two_sweeps_256_ms", lambda: round(loop_time(
        two_sweeps, x3, m3, inner=32) * 1e3, 3))

    def xs_scale(v, mm, sigma):
        mc = jnp.clip(mm, 0, 1)
        mf = mc.astype(v.dtype)

        def syz(u):
            u = gaussian_smooth_axis(u, 1, sigma, SPC[1])
            return gaussian_smooth_axis(u, 2, sigma, SPC[2])

        return fused_features8_xs_stream(
            syz(v * mf), syz(mf), mc, sigma, SPC, stack=False)[0]

    def multi_dual_xs(v, mm):
        g = fused_features8_sweep_multi(v, mm, (0.6, 1.2), SPC,
                                        stack=False)
        outs = [g[0][0], g[1][0], xs_scale(v, mm, 2.4),
                fused_features8(v, mm, 4.8, SPC, stack=False)[0]]
        return jnp.stack(outs, 0).sum(0)

    def multi_dual_ys(v, mm):
        g = fused_features8_sweep_multi(v, mm, (0.6, 1.2), SPC,
                                        stack=False)
        y = multiscale_features8_fused(v, mm, (2.4, 4.8), SPC,
                                       stack=False)
        outs = [g[0][0], g[1][0], y[0][0], y[1][0]]
        return jnp.stack(outs, 0).sum(0)

    vox4 = 4 * float(np.prod(shape3))
    attempt("multi4_dualxs_256_ms", lambda: round(loop_time(
        multi_dual_xs, x3, m3, inner=16) * 1e3, 3))
    if isinstance(out.get("multi4_dualxs_256_ms"), float):
        out["config3_dualxs_gvox_s"] = round(
            vox4 / out["multi4_dualxs_256_ms"] / 1e6, 3)
    attempt("multi4_dualys_256_ms", lambda: round(loop_time(
        multi_dual_ys, x3, m3, inner=16) * 1e3, 3))
    if isinstance(out.get("multi4_dualys_256_ms"), float):
        out["config3_dualys_gvox_s"] = round(
            vox4 / out["multi4_dualys_256_ms"] / 1e6, 3)


if __name__ == "__main__":
    main()
