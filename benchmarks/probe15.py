"""probe15 (round 4): MXU band-einsum smoothing + post_stream vs the
nc-sweep staged path, per sigma per shape — sets the features8_auto
dispatch crossover. The nc sweep's per-row tap work scales ~linearly
with the smoothing radius (probe14: 31 ms at rx=14 -> 72 ms at rx=28,
512^3), while the einsum smoothing is ~traffic-bound and
radius-independent; somewhere they cross.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp


def loop_time(fn, x, *rest, inner=12, reps=3):
    shape = x.shape

    @jax.jit
    def loop(v, *r):
        def body(_, c):
            out = fn(c, *r)
            return out if out.shape == shape else out[..., 0]
        return jax.lax.fori_loop(0, inner, body, v)[0, 0].sum()

    float(loop(x, *rest))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(x, *rest))
        ts.append(time.perf_counter() - t0)
    return min(ts) / inner


def main():
    from ife_tpu.kernels.fused import fused_features8_post_stream
    from ife_tpu.ops.stencil import normalized_gaussian_convolution

    out = {}

    def attempt(key, thunk):
        try:
            out[key] = thunk()
        except Exception as e:
            out[key] = f"ERROR {type(e).__name__}: {str(e)[:120]}"
        print(key, out[key], flush=True)
        with open("benchmarks/out/r4_probe15.json", "w") as f:
            json.dump(out, f, indent=1)

    for n in (512, 256):
        shape = (n, n, n)
        spc = (0.78, 0.78, 1.0)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, shape, jnp.float32) * 200.0 - 600.0
        m = (jax.random.uniform(jax.random.PRNGKey(1), shape) > 0.25
             ).astype(jnp.float32)

        for sigma in (2.4, 3.5, 4.8):
            tag = f"{n}_s{sigma:g}"

            def einsum_staged(v, mm, s=sigma):
                sm = normalized_gaussian_convolution(v, mm, s, spc)
                return fused_features8_post_stream(
                    sm, mm, spc, stack=False)[0]

            attempt(f"einsum_staged_ms_{tag}",
                    lambda f=einsum_staged: round(
                        loop_time(f, x, m) * 1e3, 2))
            attempt(f"einsum_nc_ms_{tag}", lambda s=sigma: round(loop_time(
                lambda v, mm: normalized_gaussian_convolution(
                    v, mm, s, spc), x, m) * 1e3, 2))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
