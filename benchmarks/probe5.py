"""Smoothing-path shootout at 512^3 on the chip:
conv-per-axis (current) vs banded-matrix einsum on the MXU.

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe5.py
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from ife_tpu.ops import stencil

INNER = 5
SIGMA = 1.2
SPACING = (0.78, 0.78, 1.0)


def band_smooth(x, sigma, spacing, truncate=4.5, precision="highest"):
    """Separable Gaussian as three banded-matrix MXU contractions."""
    for axis in range(3):
        sv = float(sigma) / float(spacing[axis])
        r = stencil.gaussian_radius(sv, truncate)
        W = jnp.asarray(
            stencil._band_matrix(x.shape[axis], sv, r), dtype=x.dtype)
        spec = {0: "oi,iyz->oyz", 1: "oj,xjz->xoz", 2: "ok,xyk->xyo"}[axis]
        x = jnp.einsum(spec, W, x, precision=precision)
    return x


def timed(tag, fn, x):
    @jax.jit
    def loop(v):
        out = jax.lax.fori_loop(0, INNER, lambda _, c: fn(c), v)
        return out[0, 0].sum()

    float(loop(x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x))
        times.append(time.perf_counter() - t0)
    dt = min(times) / INNER
    vox = float(np.prod(x.shape))
    print(json.dumps({"stage": tag, "ms": round(dt * 1e3, 2),
                      "gvox_s": round(vox / dt / 1e9, 2)}), flush=True)


def main():
    shape = (512, 512, 512)
    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype=jnp.float32)
    x.block_until_ready()

    timed("band_einsum_highest",
          lambda v: band_smooth(v, SIGMA, SPACING, precision="highest"), x)
    timed("band_einsum_high",
          lambda v: band_smooth(v, SIGMA, SPACING, precision="high"), x)

    # accuracy of HIGH (bf16x3) vs HIGHEST (bf16x6) at CT-like magnitudes
    xs = x[:128, :128, :128] * 1000.0
    a = np.asarray(band_smooth(xs, SIGMA, SPACING, precision="high"))
    b = np.asarray(band_smooth(xs, SIGMA, SPACING, precision="highest"))
    print(json.dumps({"high_vs_highest_max_rel":
                      float(np.abs(a - b).max() / np.abs(b).max())}))


if __name__ == "__main__":
    main()
