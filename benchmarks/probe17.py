"""probe17 (round 4): shape-aware block sizes for the streaming kernels.

At 512^3 the stream kernels' (block, Y, Z) slabs are ~1-2 MB and the
kernels run at ~445 GB/s effective; at 256^3 the same block=2 default
makes 0.5 MB slabs and effective bandwidth halves (post_stream: 3.33 ms
for 0.67 GB = 200 GB/s) — per-step overheads dominate. Sweep the block
size per shape to set an auto rule (config 2/3 are measured at
128^3/256^3).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from benchmarks._timing import loop_time, make_attempt  # noqa: E402


def main():
    from ife_tpu.kernels.fused import (
        fused_features8_post_stream, fused_features8_sweep,
        fused_hessian_eig_stream,
    )
    from ife_tpu.ops.stencil import normalized_gaussian_convolution

    out = {}
    attempt = make_attempt(out, "benchmarks/out/r4_probe17.json")
    spc = (0.78, 0.78, 1.0)

    for n, inner in ((256, 24), (128, 48)):
        shape = (n, n, n)
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
        m = (jax.random.uniform(jax.random.PRNGKey(1), shape) > 0.25
             ).astype(jnp.float32)
        s = normalized_gaussian_convolution(x, m, 1.0, spc)
        s = jnp.asarray(s)

        for blk in (2, 4, 8, 16, 32):
            attempt(f"stream_b{blk}_{n}_ms", lambda b=blk: round(loop_time(
                lambda v: fused_hessian_eig_stream(
                    v, spc, block=b, stack=False)[0], x,
                inner=inner) * 1e3, 3))
            attempt(f"post_b{blk}_{n}_ms", lambda b=blk: round(loop_time(
                lambda v, mm: fused_features8_post_stream(
                    v, mm, spc, block=b, stack=False)[0], s, m,
                inner=inner) * 1e3, 3))
        for blk in (1, 2, 4):
            attempt(f"sweep_b{blk}_{n}_ms", lambda b=blk: round(loop_time(
                lambda v, mm: fused_features8_sweep(
                    v, mm, 1.0, spc, block=b, stack=False)[0], x, m,
                inner=inner) * 1e3, 3))

    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()
