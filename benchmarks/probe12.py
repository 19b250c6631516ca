"""On-chip probe: fused_features8_tap (ALL smoothing in-kernel) vs xs vs
staged at 512^3, plus on-chip parity of the tap kernel.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe12.py [mode...]
       modes: tap tap16 tapnb1 xs staged parity all
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
SIGMA = 1.0
MODES = sys.argv[1:] or ["all"]


def timed_loop(fn, img, m, inner=8, reps=3, label=""):
    @jax.jit
    def loop(v, mm):
        def body(_, c):
            out = fn(c, mm)
            return out[0] if isinstance(out, tuple) else out
        out = jax.lax.fori_loop(0, inner, body, v)
        return out[0, 0].sum()

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
    gvox = np.prod(SHAPE) / dt / 1e9
    print(f"  [{label}] {dt*1e3:8.2f} ms/pass  {gvox:7.2f} Gvox/s",
          flush=True)
    return dt


def main():
    from ife_tpu.kernels.fused import (
        fused_features8, fused_features8_tap, fused_features8_xs,
    )

    d = jax.devices()[0]
    print(f"device: {d.platform} {d.device_kind}", flush=True)
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, SHAPE, jnp.float32) * 200.0 - 600.0
    m = (jax.random.uniform(jax.random.PRNGKey(1), SHAPE) > 0.25).astype(
        jnp.float32)
    img.block_until_ready()

    want = lambda x: x in MODES or "all" in MODES

    if want("tap"):
        timed_loop(lambda v, mm: fused_features8_tap(
            v, mm, SIGMA, SPACING, stack=False), img, m, label="tap")
    if want("tap16"):
        timed_loop(lambda v, mm: fused_features8_tap(
            v, mm, SIGMA, SPACING, stack=False, block=(16, 128)),
            img, m, label="tap16")
    if want("tapnb1"):
        timed_loop(lambda v, mm: fused_features8_tap(
            v, mm, SIGMA, SPACING, stack=False, block=(16, 128), n_buf=1),
            img, m, label="tapnb1")
    if want("xs"):
        timed_loop(lambda v, mm: fused_features8_xs(
            v, mm, SIGMA, SPACING, stack=False), img, m, label="xs")
    if want("staged"):
        timed_loop(lambda v, mm: fused_features8(
            v, mm, SIGMA, SPACING, stack=False), img, m, label="staged")
    if want("parity"):
        from ife_tpu.ops.features import features8
        ps = (128, 128, 256)
        imgs = jax.random.normal(jax.random.PRNGKey(2), ps,
                                 jnp.float32) * 200.0 - 600.0
        ms = (jax.random.uniform(jax.random.PRNGKey(3), ps) > 0.25).astype(
            jnp.float32)

        @jax.jit
        def diff(v, mm):
            a = jnp.moveaxis(
                fused_features8_tap(v, mm, SIGMA, SPACING, stack=True), 0, -1)
            b = features8(v, mm, SIGMA, SPACING)
            scale = jnp.maximum(jnp.abs(b).reshape(-1, 8).max(axis=0), 1.0)
            direct = jnp.abs(a - b).reshape(-1, 8).max(axis=0) / scale
            ea = jnp.sort(a[..., 2:5], axis=-1)
            eb = jnp.sort(b[..., 2:5], axis=-1)
            eig = jnp.abs(ea - eb).max() / jnp.maximum(jnp.abs(eb).max(), 1.0)
            return direct, eig

        direct, eig = (np.asarray(e) for e in diff(imgs, ms))
        print("parity tap-vs-XLA per channel:",
              " ".join(f"{v:.2e}" for v in direct), flush=True)
        print(f"parity eig sorted: {float(eig):.2e}", flush=True)


if __name__ == "__main__":
    main()
