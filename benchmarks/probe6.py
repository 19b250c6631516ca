"""On-chip probe: block-banded MXU smoothing vs dense band, staged
features8 end-to-end, and staged-vs-XLA on-chip parity at 512^3.

The dense (n, n) band contraction is MXU-FLOP-bound at n=512 (~40x wasted
work for a 13-tap band, 19 ms/volume measured round 1); blocking the
output axis to ~128-wide contractions should cut that ~4x. Timing via the
loop-amortized method (benchmarks/probe3.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe6.py [mode]
       mode: smooth | staged | parity | all (default all)
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
MODE = sys.argv[1] if len(sys.argv) > 1 else "all"


def timed_loop(fn, *args, inner=8, reps=3, label=""):
    @jax.jit
    def loop(v, *rest):
        def body(_, c):
            out = fn(c, *rest)
            return out[..., 0] if out.ndim == 4 else out
        out = jax.lax.fori_loop(0, inner, body, v)
        return out[0, 0].sum()

    t0 = time.perf_counter()
    float(loop(*args))
    print(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(*args))
        times.append(time.perf_counter() - t0)
    dt = min(times) / inner
    gvox = np.prod(SHAPE) / dt / 1e9
    print(f"  [{label}] {dt*1e3:8.2f} ms/pass  {gvox:7.2f} Gvox/s",
          flush=True)
    return dt


def main():
    d = jax.devices()[0]
    print(f"device: {d.platform} {d.device_kind}", flush=True)
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, SHAPE, jnp.float32) * 200.0 - 600.0
    m = (jax.random.uniform(jax.random.PRNGKey(1), SHAPE) > 0.25).astype(
        jnp.float32
    )
    img.block_until_ready()

    from ife_tpu.ops import stencil
    from ife_tpu.ops.stencil import (
        _band_matrix, _einsum_axis, _blocked_band_axis, gaussian_radius,
        gaussian_smooth,
    )
    from ife_tpu.kernels.fused import fused_features8
    from ife_tpu.ops.features import features8

    if MODE in ("smooth", "all"):
        sv = SIGMA / SPACING[0]
        r = gaussian_radius(sv)
        W = jnp.asarray(_band_matrix(SHAPE[0], sv, r), jnp.float32)
        print(f"sigma_vox={sv:.3f} radius={r}", flush=True)
        timed_loop(lambda v: _einsum_axis(W, v, 0), img,
                   label="dense band, axis 0")
        timed_loop(lambda v: _blocked_band_axis(W, v, 0, r), img,
                   label="blocked band, axis 0")
        timed_loop(lambda v: gaussian_smooth(v, SIGMA, SPACING), img,
                   label="gaussian_smooth 3-axis (blocked)")

    if MODE in ("staged", "all"):
        timed_loop(
            lambda v, mm: fused_features8(v, mm, SIGMA, SPACING,
                                          stack=False)[0],
            img, m, label="features8 staged (blocked smooth)")

    if MODE in ("parity", "all"):
        @jax.jit
        def diff(v, mm):
            a = jnp.moveaxis(
                fused_features8(v, mm, SIGMA, SPACING, stack=True), 0, -1
            )
            b = features8(v, mm, SIGMA, SPACING)
            scale = jnp.maximum(
                jnp.abs(b).reshape(-1, 8).max(axis=0), 1.0
            )
            return jnp.abs(a - b).reshape(-1, 8).max(axis=0) / scale

        e = np.asarray(diff(img, m))
        print("parity staged-vs-XLA per channel:",
              " ".join(f"{x:.2e}" for x in e), flush=True)


if __name__ == "__main__":
    main()
