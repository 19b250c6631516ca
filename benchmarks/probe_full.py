"""On-chip probe: fully-fused features8 kernel vs the staged path at 512^3.

Timing via the loop-amortized method (benchmarks/probe3.py): N serial
passes inside one jit, fetch one data-dependent scalar, divide by N —
the only method that survives the axon tunnel's RPC jitter.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_full.py
       [sigma] [precision] [mode: full|staged|parity|all]
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
SIGMA = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
PRECISION = sys.argv[2] if len(sys.argv) > 2 else "highest"
MODE = sys.argv[3] if len(sys.argv) > 3 else "all"


def make_inputs():
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, SHAPE, jnp.float32) * 200.0 - 600.0
    # blobby mask with inside/outside structure
    k2 = jax.random.PRNGKey(1)
    m = (jax.random.uniform(k2, SHAPE) > 0.25).astype(jnp.float32)
    return img, m


def timed_loop(fn, img, m, inner=8, reps=3):
    # serial dependence: feed prev output channel back as the image
    @jax.jit
    def loop2(v, mm):
        def body(_, c):
            out = fn(c, mm)
            return out[..., 0] if out.ndim == 4 else out
        out = jax.lax.fori_loop(0, inner, body, v)
        return out[0, 0].sum()

    t0 = time.perf_counter()
    float(loop2(img, m))
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop2(img, m))
        times.append(time.perf_counter() - t0)
    dt = min(times) / inner
    gvox = np.prod(SHAPE) / dt / 1e9
    return dt, gvox


def main():
    d = jax.devices()[0]
    print(f"device: {d.platform} {d.device_kind}", flush=True)
    img, m = make_inputs()
    img.block_until_ready()

    from ife_tpu.kernels.fused import (
        fused_features8, fused_features8_full, full_fusion_viable,
    )

    print(f"sigma={SIGMA} precision={PRECISION} "
          f"viable={full_fusion_viable(SHAPE, SIGMA, SPACING)}", flush=True)

    def full(v, mm):
        return fused_features8_full(
            v, mm, SIGMA, SPACING, precision=PRECISION, stack=False
        )[0]

    def staged(v, mm):
        return fused_features8(v, mm, SIGMA, SPACING, stack=False)[0]

    if MODE in ("full", "all"):
        dt, gv = timed_loop(lambda v, mm: full(v, mm), img, m)
        print(f"FULL   : {dt*1e3:8.2f} ms/pass  {gv:7.2f} Gvox/s", flush=True)
    if MODE in ("staged", "all"):
        dt, gv = timed_loop(lambda v, mm: staged(v, mm), img, m)
        print(f"STAGED : {dt*1e3:8.2f} ms/pass  {gv:7.2f} Gvox/s", flush=True)
    if MODE in ("parity", "all"):
        @jax.jit
        def diff(v, mm):
            a = fused_features8_full(
                v, mm, SIGMA, SPACING, precision=PRECISION, stack=True
            )
            b = fused_features8(v, mm, SIGMA, SPACING, stack=True)
            scale = jnp.maximum(jnp.abs(b).max(axis=(1, 2, 3)), 1.0)
            return jnp.abs(a - b).max(axis=(1, 2, 3)) / scale

        e = np.asarray(diff(img, m))
        print("parity full-vs-staged per channel:",
              " ".join(f"{x:.2e}" for x in e), flush=True)


if __name__ == "__main__":
    main()
