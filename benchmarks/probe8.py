"""On-chip probe: fused_hessian_eig variant matrix at 512^3 f32.

Variants:
  * concat8  — shipped r2 kernel (slice+concat lane shifts, 8x128 blocks)
  * roll8    — pltpu.roll lane shifts (1 relayout instead of 2 per shift)
  * floor8   — same DMA traffic, near-zero compute: the HBM/DMA floor
  * roll16 / concat16 — 16x128 blocks (lower halo read amplification),
    n_buf forced to 2 (the VMEM model would fall back to 1)
  * parity   — roll vs concat on-chip agreement at (128,128,256)

Timing: loop-amortized (N serial passes inside one jit, fetch one scalar,
divide by N — benchmarks/probe3.py method; the only method that survives
the axon tunnel's RPC jitter).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe8.py [mode...]
       modes: roll8 concat8 floor8 roll16 concat16 parity all
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
MODES = sys.argv[1:] or ["all"]


def timed_loop(fn, x, inner=10, reps=3, label=""):
    @jax.jit
    def loop(v):
        out = jax.lax.fori_loop(0, inner, lambda _, c: fn(c), v)
        return out[0, 0].sum()

    t0 = time.perf_counter()
    float(loop(x))
    print(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(x))
        times.append(time.perf_counter() - t0)
    dt = min(times) / inner
    gvox = np.prod(SHAPE) / dt / 1e9
    print(f"  [{label}] {dt*1e3:8.2f} ms/pass  {gvox:7.2f} Gvox/s",
          flush=True)
    return dt


def main():
    from ife_tpu.kernels.fused import fused_hessian_eig

    d = jax.devices()[0]
    print(f"device: {d.platform} {d.device_kind}", flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE, jnp.float32)
    x.block_until_ready()

    def run(label, **kw):
        timed_loop(
            lambda v: fused_hessian_eig(v, SPACING, stack=False, **kw)[0],
            x, label=label)

    want = lambda m: m in MODES or "all" in MODES

    if want("roll8"):
        run("roll8", variant="roll")
    if want("concat8"):
        run("concat8", variant="concat")
    if want("floor8"):
        run("floor8", variant="copyfloor")
    if want("roll16"):
        run("roll16", variant="roll", block=(16, 128), n_buf=2)
    if want("concat16"):
        run("concat16", variant="concat", block=(16, 128), n_buf=2)
    if want("floor16"):
        run("floor16", variant="copyfloor", block=(16, 128), n_buf=2)
    if want("parity"):
        xs = jax.random.normal(jax.random.PRNGKey(1), (128, 128, 256),
                               jnp.float32) * 100.0

        @jax.jit
        def diff(v):
            a = fused_hessian_eig(v, SPACING, stack=True, variant="roll")
            b = fused_hessian_eig(v, SPACING, stack=True, variant="concat")
            scale = jnp.maximum(jnp.abs(b).max(axis=(1, 2, 3)), 1.0)
            return jnp.abs(a - b).max(axis=(1, 2, 3)) / scale

        e = np.asarray(diff(xs))
        print("parity roll-vs-concat per channel:",
              " ".join(f"{v:.2e}" for v in e), flush=True)


if __name__ == "__main__":
    main()
