"""On-chip probe: where does the HBM bandwidth go? probe8 showed
fused_hessian_eig is DMA-bound at ~327 GB/s touched-bytes (floor 11.2 ms
for 3.67 GB) — 40% of the v5e's 819 GB/s. Compare against what XLA
achieves for the same traffic patterns:

  * xla1     — y = x * c                     (1.07 GB touched)
  * xla6     — six outputs x * c_k           (3.76 GB touched)
  * xla6f    — six outputs, fori-loop serial (same, loop-amortized)
  * pallas6  — trivial Pallas: blocked input spec (NO manual window DMA),
               six output blocks              (3.76 GB)
  * floor8   — current kernel's copy floor (manual halo window DMA)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe10.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (512, 512, 512)
GB = float(np.prod(SHAPE)) * 4 / 1e9
MODES = sys.argv[1:] or ["all"]


def timed(fn, x, n_out, inner=10, reps=3, label=""):
    @jax.jit
    def loop(v):
        def body(_, c):
            out = fn(c)
            return out[0] if isinstance(out, (tuple, list)) else out
        return jax.lax.fori_loop(0, inner, body, v)[0, 0].sum()

    t0 = time.perf_counter()
    float(loop(x))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(x))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / inner
    touched = GB * (1 + n_out)
    print(f"  [{label:8s}] {dt*1e3:8.2f} ms  {touched/dt:6.1f} GB/s touched"
          f"  (compile {c:.0f}s)", flush=True)
    return dt


def trivial6(x, bx=8, by=128):
    X, Y, Z = x.shape

    def kern(x_ref, *outs):
        v = x_ref[:]
        for k, o in enumerate(outs):
            o[:] = v * jnp.asarray(1.0 + 1e-6 * k, v.dtype)

    spec = pl.BlockSpec((bx, by, Z), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(X // bx, Y // by),
        in_specs=[spec],
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype)] * 6,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def main():
    d = jax.devices()[0]
    print(f"device: {d.platform} {d.device_kind}", flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE, jnp.float32)
    x.block_until_ready()
    want = lambda m: m in MODES or "all" in MODES

    if want("xla1"):
        timed(lambda v: v * jnp.asarray(1.000001, v.dtype), x, 1,
              label="xla1")
    if want("xla6"):
        timed(lambda v: [v * jnp.asarray(1.0 + 1e-6 * k, v.dtype)
                         for k in range(6)], x, 6, label="xla6")
    if want("pallas6"):
        timed(lambda v: trivial6(v), x, 6, label="pallas6")
    if want("pallas6_16"):
        timed(lambda v: trivial6(v, bx=16), x, 6, label="pallas6_16")
    if want("pallas6_y256"):
        timed(lambda v: trivial6(v, by=256), x, 6, label="p6_8x256")
    if want("floor8"):
        from ife_tpu.kernels.fused import fused_hessian_eig
        timed(lambda v: fused_hessian_eig(
            v, (0.78, 0.78, 1.0), stack=False, variant="copyfloor")[0],
            x, 6, label="floor8")


if __name__ == "__main__":
    main()
