"""Block-shape sweep with loop-amortized timing (the only reliable way to
time through the axon tunnel — see bench.py).

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe3.py
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ife_tpu.kernels.fused import fused_hessian_eig

INNER = 10


@functools.partial(jax.jit, static_argnames=("block",))
def loop(v, block):
    def body(_, c):
        return fused_hessian_eig(c, (0.78, 0.78, 1.0), block=block,
                                 stack=False)[0]
    out = jax.lax.fori_loop(0, INNER, body, v)
    return out[0, 0].sum()


def main():
    shape = (512, 512, 512)
    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype=jnp.float32)
    x.block_until_ready()
    vox = float(np.prod(shape))
    for blk in ((8, 32), (8, 64), (8, 128), (16, 64), (16, 16)):
        try:
            float(loop(x, blk))  # compile + warm
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(x, blk))
                times.append(time.perf_counter() - t0)
            dt = min(times) / INNER
            print(json.dumps({"block": blk, "ms": round(dt * 1e3, 2),
                              "gvox_s": round(vox / dt / 1e9, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"block": blk, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
