"""One-off perf probe: where does the fused hessian+eig kernel's time go?

Measures, at 512^3 on the real chip:
  copy6    — same DMA window pipeline + 6 outputs, compute = passthrough
             (the memory-bound floor for this block layout)
  stencil6 — window + all 6 second-derivative stencils, no eigen
  full     — the shipping fused_hessian_eig

Not part of the test suite or bench.py; run manually:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_fused.py
"""
import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ife_tpu.kernels import fused as F


def _variant_kernel(mode, x_hbm, o0, o1, o2, o3, o4, o5, scratch, sem, *,
                    bx, by, wy, hx, hy, hz, n_buf):
    win = F._window_pipeline(x_hbm, scratch, sem, bx, by, wy, n_buf)
    s = win[:, : by + 2, :]
    if mode == "copy6":
        core = s[1:-1, 1:-1, :]
        for ref in (o0, o1, o2, o3, o4, o5):
            ref[:] = core
        return
    _, dxx, dyy, dzz, dxy, dxz, dyz, _, _, _ = F._stencil_block(s, hx, hy, hz)
    for ref, val in zip((o0, o1, o2, o3, o4, o5),
                        (dxx, dyy, dzz, dxy, dxz, dyz)):
        ref[:] = val


@functools.partial(jax.jit, static_argnames=("mode", "block"))
def variant(x, mode, block=(8, 64)):
    X, Y, Z = x.shape
    tx, ty = (block, block) if isinstance(block, int) else block
    bx, _ = F._pick_block(X, tx)
    by, _ = F._pick_block(Y, ty)
    wy = -(-(by + 2) // 8) * 8
    xp = jnp.pad(x, ((1, 1), (1, wy - by - 1), (0, 0)), mode="edge")
    n_buf = F._pick_n_buf(bx, by, wy, Z, 6, x.dtype.itemsize)
    kernel = functools.partial(
        _variant_kernel, mode, bx=bx, by=by, wy=wy,
        hx=0.78, hy=0.78, hz=1.0, n_buf=n_buf,
    )
    out_spec = pl.BlockSpec((bx, by, Z), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(X // bx, Y // by),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((X, Y, Z), x.dtype)] * 6,
        scratch_shapes=[
            pltpu.VMEM((n_buf, bx + 2, wy, Z), x.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )(xp)


def time_fn(fn, x, iters=5):
    @jax.jit
    def tiny(v):
        return v.sum()

    small = jnp.ones(8)
    float(tiny(small))
    t0 = time.perf_counter()
    for _ in range(10):
        float(tiny(small))
    rpc = (time.perf_counter() - t0) / 10

    outs = fn(x)
    float(outs[0][0, 0, 0] if isinstance(outs, (tuple, list)) else outs[0, 0, 0, 0] if outs.ndim == 4 else outs[0][0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = fn(x)
        # data-dependent fetch (axon block_until_ready returns early)
        o = outs[0] if isinstance(outs, (tuple, list)) else outs
        float(o.sum())
        times.append(time.perf_counter() - t0)
    return max(float(np.median(times)) - rpc, 1e-9)


def main():
    shape = (512, 512, 512)
    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype=jnp.float32)
    x.block_until_ready()
    vox = float(np.prod(shape))
    res = {}
    for mode in ("copy6", "stencil6"):
        dt = time_fn(lambda v, m=mode: variant(v, m), x)
        res[mode] = {"ms": round(dt * 1e3, 2), "gvox_s": round(vox / dt / 1e9, 2)}
        print(json.dumps({mode: res[mode]}), flush=True)
    dt = time_fn(lambda v: F.fused_hessian_eig(v, (0.78, 0.78, 1.0), stack=False), x)
    res["full"] = {"ms": round(dt * 1e3, 2), "gvox_s": round(vox / dt / 1e9, 2)}
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
