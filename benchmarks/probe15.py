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


from benchmarks._timing import loop_time, make_attempt  # noqa: E402


def main():
    from ife_tpu.kernels.fused import fused_features8_post_stream
    from ife_tpu.ops.stencil import normalized_gaussian_convolution

    out = {}

    attempt = make_attempt(out, "benchmarks/out/r4_probe15.json")

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
                        loop_time(f, x, m, inner=12) * 1e3, 2))
            attempt(f"einsum_nc_ms_{tag}", lambda s=sigma: round(loop_time(
                lambda v, mm: normalized_gaussian_convolution(
                    v, mm, s, spc), x, m, inner=12) * 1e3, 2))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
