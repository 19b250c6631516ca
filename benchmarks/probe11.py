"""On-chip probe: what is the REAL streaming ceiling of this chip for the
fused_hessian_eig traffic pattern (read 1 + write 6 volumes, 512^3 f32)?

probe10 left an ambiguity: trivial Pallas 6-output kernels measured ~380
GB/s touched, XLA elementwise 1-in-1-out only 254 GB/s (suspicious), and
the 6-output XLA number (1400 GB/s) was certainly DCE'd down to one
output. This probe pins the ceiling properly:

  * ovh      — per-iteration overhead: trivial6 at inner 5/10/20 must give
               the same ms/pass or the loop method has a fixed cost
  * xla6h    — honest XLA 6-output elementwise: outputs pass through
               lax.optimization_barrier so none can be DCE'd
  * pcopy1   — Pallas 1-in-1-out blocked copy (pure pallas BW reference)
  * par6     — trivial6 with dimension_semantics=("parallel","parallel")
  * big6     — trivial6 with (8, 512)-blocks (1/4 the grid steps)
  * flpar    — the fused_hessian_eig copy-floor window pattern (manual
               halo DMA + 6 output blocks) with parallel semantics

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe11.py [mode...]
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
VLIM = 112 * 1024 * 1024


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
          f"  (inner={inner}, compile {c:.0f}s)", flush=True)
    return dt


def trivial6(x, bx=8, by=128, dims=None):
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
            vmem_limit_bytes=VLIM, dimension_semantics=dims),
    )(x)


def pcopy1(x, bx=8, by=128):
    X, Y, Z = x.shape

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] * jnp.asarray(1.000001, x_ref.dtype)

    spec = pl.BlockSpec((bx, by, Z), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(X // bx, Y // by), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VLIM),
    )(x)


def floor_window(x, bx=8, by=128, dims=None):
    """fused_hessian_eig's copy-floor: manual halo-window DMA input (ANY
    memory space, (bx+2, wy, Z) window) + 6 output blocks."""
    X, Y, Z = x.shape
    wy = -(-(by + 2) // 8) * 8
    xp = jnp.pad(x, ((1, 1), (1, wy - by - 1), (0, 0)), mode="edge")

    def kern(x_hbm, *args):
        outs, (scratch, sem) = args[:6], args[6:]
        i = pl.program_id(0)
        j = pl.program_id(1)
        n_j = pl.num_programs(1)
        step = i * n_j + j

        def window_dma(s, slot):
            wi = s // n_j
            wj = s % n_j
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(wi * bx, bx + 2), pl.ds(wj * by, wy), :],
                scratch.at[slot], sem.at[slot])

        @pl.when(step == 0)
        def _():
            window_dma(step, 0).start()

        n_tot = pl.num_programs(0) * n_j

        @pl.when(step + 1 < n_tot)
        def _():
            window_dma(step + 1, (step + 1) % 2).start()

        window_dma(step, step % 2).wait()
        s = scratch[step % 2]
        core = s[1:-1, 1:by + 1, :]
        for k, o in enumerate(outs):
            o[:] = core + jnp.asarray(float(k), s.dtype)

    spec = pl.BlockSpec((bx, by, Z), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(X // bx, Y // by),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype)] * 6,
        scratch_shapes=[pltpu.VMEM((2, bx + 2, wy, Z), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VLIM, dimension_semantics=dims),
    )(xp)


def main():
    d = jax.devices()[0]
    print(f"device: {d.platform} {d.device_kind}", flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE, jnp.float32)
    x.block_until_ready()
    want = lambda s: s in MODES or "all" in MODES

    if want("ovh"):
        timed(trivial6, x, 6, inner=5, label="t6_i5")
        timed(trivial6, x, 6, inner=20, label="t6_i20")
    if want("xla6h"):
        def xla6h(v):
            outs = tuple(v * jnp.asarray(1.0 + 1e-6 * k, v.dtype)
                         for k in range(6))
            return jax.lax.optimization_barrier(outs)
        timed(xla6h, x, 6, label="xla6h")
    if want("pcopy1"):
        timed(pcopy1, x, 1, label="pcopy1")
    if want("par6"):
        timed(lambda v: trivial6(v, dims=("parallel", "parallel")), x, 6,
              label="par6")
    if want("big6"):
        timed(lambda v: trivial6(v, by=512), x, 6, label="big6")
    if want("flpar"):
        timed(lambda v: floor_window(v, dims=("parallel", "parallel")), x,
              6, label="flpar")
    if want("flarb"):
        timed(floor_window, x, 6, label="flarb")


if __name__ == "__main__":
    main()
