"""Loop-amortized timing of the flagship features8 pass at 512^3:
full fused_features8 vs the normalized-convolution (smoothing) stage alone.

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe4.py
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from ife_tpu.kernels.fused import fused_features8
from ife_tpu.ops.stencil import normalized_gaussian_convolution

INNER = 5
SIGMA = 1.2
SPACING = (0.78, 0.78, 1.0)


def timed(tag, fn, x, m):
    @jax.jit
    def loop(v, mm):
        # mm must be a parameter: a closed-over device array is embedded
        # in the compile payload (536MB -> tunnel HTTP 413)
        out = jax.lax.fori_loop(0, INNER, lambda _, c: fn(c, mm), v)
        return out[0, 0].sum()

    float(loop(x, m))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x, m))
        times.append(time.perf_counter() - t0)
    dt = min(times) / INNER
    vox = float(np.prod(x.shape))
    print(json.dumps({"stage": tag, "ms": round(dt * 1e3, 2),
                      "gvox_s": round(vox / dt / 1e9, 2)}), flush=True)


def main():
    shape = (512, 512, 512)
    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype=jnp.float32)
    m = (jax.random.uniform(jax.random.PRNGKey(1), shape) > 0.3).astype(
        jnp.float32)
    x.block_until_ready(); m.block_until_ready()

    timed("smooth_normconv", lambda v, mm: normalized_gaussian_convolution(
        v, mm, SIGMA, SPACING), x, m)
    timed("features8_fused", lambda v, mm: fused_features8(
        v, mm, SIGMA, SPACING, stack=False)[0], x, m)


if __name__ == "__main__":
    main()
