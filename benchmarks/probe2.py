"""Probe: fused_hessian_eig block-shape sweep (halo-amplification study).

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe2.py
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from ife_tpu.kernels.fused import fused_hessian_eig


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
    float(outs[0].sum())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = fn(x)
        float(outs[0].sum())
        times.append(time.perf_counter() - t0)
    return max(float(np.median(times)) - rpc, 1e-9)


def main():
    shape = (512, 512, 512)
    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype=jnp.float32)
    x.block_until_ready()
    vox = float(np.prod(shape))
    for blk in ((8, 32), (8, 32), (16, 32), (8, 64)):
        try:
            dt = time_fn(
                lambda v: fused_hessian_eig(v, (0.78, 0.78, 1.0),
                                            block=blk, stack=False), x)
            print(json.dumps({"block": blk, "ms": round(dt * 1e3, 2),
                              "gvox_s": round(vox / dt / 1e9, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"block": blk, "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
