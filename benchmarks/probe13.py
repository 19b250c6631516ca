"""On-chip probe: features8 path selection across the scale range at 512^3
— tap (all-in-kernel smoothing) vs staged (MXU einsum smoothing + post
kernel) at the benchmark sigmas. Grounds features8_auto's dispatch
thresholds: the tap kernel's halo-window read amplification and VPU tap
count both grow with radius, the staged path's einsum band width too.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe13.py [sigma...]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

SHAPE = (512, 512, 512)
SPACING = (0.78, 0.78, 1.0)
SIGMAS = [float(s) for s in sys.argv[1:]] or [0.6, 2.4, 4.8]


def timed_loop(fn, img, m, inner=6, reps=3, label=""):
    @jax.jit
    def loop(v, mm):
        def body(_, c):
            out = fn(c, mm)
            return out[0] if isinstance(out, tuple) else out
        return jax.lax.fori_loop(0, inner, body, v)[0, 0].sum()

    t0 = time.perf_counter()
    float(loop(img, m))
    print(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(img, m))
        times.append(time.perf_counter() - t0)
    dt = min(times) / inner
    print(f"  [{label}] {dt*1e3:8.2f} ms/pass  "
          f"{np.prod(SHAPE)/dt/1e9:7.2f} Gvox/s", flush=True)
    return dt


def main():
    from ife_tpu.kernels.fused import fused_features8, fused_features8_tap

    d = jax.devices()[0]
    print(f"device: {d.platform} {d.device_kind}", flush=True)
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, SHAPE, jnp.float32) * 200.0 - 600.0
    m = (jax.random.uniform(jax.random.PRNGKey(1), SHAPE) > 0.25).astype(
        jnp.float32)
    img.block_until_ready()

    for s in SIGMAS:
        try:
            timed_loop(lambda v, mm: fused_features8_tap(
                v, mm, s, SPACING, stack=False), img, m,
                label=f"tap s={s:g}")
        except Exception as e:
            print(f"  [tap s={s:g}] FAILED: {type(e).__name__}", flush=True)
        try:
            timed_loop(lambda v, mm: fused_features8(
                v, mm, s, SPACING, stack=False), img, m,
                label=f"staged s={s:g}")
        except Exception as e:
            print(f"  [staged s={s:g}] FAILED: {type(e).__name__}",
                  flush=True)


if __name__ == "__main__":
    main()
