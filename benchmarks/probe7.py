"""On-chip probe: per-axis Gaussian-smoothing strategy matrix at 512^3 f32.

Variants per axis:
  * shiftfma  — edge-pad + K shifted slices + weighted sum (VPU; along the
    leading axis this is relayout-free and should be memory-bound)
  * dense     — (n, n) band-matrix einsum (MXU), HIGHEST / HIGH precision
  * blocked   — output-blocked band einsum (MXU), HIGHEST / HIGH

Then the best composition end-to-end: 3-axis smooth, normalized conv
(2 smooths + divide), staged features8.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe7.py
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
SIGMA_VOX = 1.282  # sigma=1.0 at 0.78 spacing
MODE = sys.argv[1] if len(sys.argv) > 1 else "all"


def timed(fn, *args, inner=8, reps=3, label=""):
    @jax.jit
    def loop(v, *rest):
        def body(_, c):
            out = fn(c, *rest)
            return out[..., 0] if out.ndim == 4 else out
        out = jax.lax.fori_loop(0, inner, body, v)
        return out[0, 0].sum()

    t0 = time.perf_counter()
    float(loop(*args))
    c = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(*args))
        times.append(time.perf_counter() - t0)
    dt = min(times) / inner
    print(f"  {label:42s} {dt*1e3:8.2f} ms  (compile {c:.0f}s)", flush=True)
    return dt


def main():
    from ife_tpu.ops.stencil import (
        _band_matrix, _einsum_axis, _blocked_band_axis, _gaussian_taps,
        _edge_pad, gaussian_radius,
    )

    d = jax.devices()[0]
    print(f"device: {d.platform} {d.device_kind}", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, SHAPE, jnp.float32)
    x.block_until_ready()

    r = gaussian_radius(SIGMA_VOX)
    taps = _gaussian_taps(SIGMA_VOX, r)
    W = jnp.asarray(_band_matrix(SHAPE[0], SIGMA_VOX, r), jnp.float32)

    def shiftfma(v, axis):
        vp = _edge_pad(v, axis, r, r)
        n = v.shape[axis]
        idx = [slice(None)] * 3
        acc = None
        for t in range(2 * r + 1):
            idx[axis] = slice(t, t + n)
            term = jnp.float32(taps[t]) * vp[tuple(idx)]
            acc = term if acc is None else acc + term
        return acc

    import functools
    ein_high = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGH)

    def dense_high(v, axis):
        letters = "abc"
        in_sub = letters[:3]
        out_sub = in_sub.replace(in_sub[axis], "o")
        return ein_high(f"o{in_sub[axis]},{in_sub}->{out_sub}", W, v)

    if MODE in ("axes", "all"):
        for axis in (0, 1, 2):
            timed(lambda v, a=axis: shiftfma(v, a), x,
                  label=f"axis{axis} shiftfma (VPU)")
            timed(lambda v, a=axis: _blocked_band_axis(W, v, a, r), x,
                  label=f"axis{axis} blocked HIGHEST")
            timed(lambda v, a=axis: dense_high(v, a), x,
                  label=f"axis{axis} dense HIGH")

    if MODE in ("e2e", "all"):
        def smooth_best(v):
            v = shiftfma(v, 0)
            v = shiftfma(v, 1)
            return _blocked_band_axis(W, v, 2, r)

        timed(smooth_best, x, label="3-axis smooth: sf/sf/blocked")

        def normconv_best(v, c):
            num = smooth_best(v * c)
            den = smooth_best(c)
            return num / den

        c = (jax.random.uniform(jax.random.PRNGKey(1), SHAPE) > 0.25).astype(
            jnp.float32)
        timed(normconv_best, x, c, label="normalized conv: best combo")

    if MODE in ("parity", "all"):
        # f64 off on TPU: compare strategies in f32 against each other
        @jax.jit
        def diff(v):
            a = shiftfma(shiftfma(_blocked_band_axis(W, v, 2, r), 0), 1)
            b = _einsum_axis(W, _einsum_axis(W, _einsum_axis(W, v, 0), 1), 2)
            return jnp.abs(a - b).max() / jnp.maximum(jnp.abs(b).max(), 1.0)

        print(f"  parity sf/sf/blocked vs dense^3: {float(diff(x)):.2e}",
              flush=True)


if __name__ == "__main__":
    main()
