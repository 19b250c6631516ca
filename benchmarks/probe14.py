"""probe14 (round 4): per-sigma features8 path timings.

Questions:
  1. What does each sigma cost at 512^3 and 256^3 through the auto
     dispatch (sweep vs staged) after the roll-tap z pass?
  2. Where does config 3 (multi-scale 256^3, 3.94 Gvox/s) actually spend
     its time?
  3. Is the staged path (nc sweep [tiled] + post_stream) faster than the
     full sweep at large sigma — i.e. where should the dispatch boundary
     sit?

Timing: loop-amortized (CLAUDE.md), inner >= 12 for the heavy passes.
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
    from ife_tpu.kernels.fused import (
        fused_features8, fused_features8_sweep, fused_normalized_conv_sweep,
        fused_normalized_conv_sweep_tiled, fused_features8_post_stream,
    )
    from ife_tpu.ops.features import _nc_tile_plan, _nc_sweep_fits, _sweep_fits

    out = {}
    for n in (512, 256):
        shape = (n, n, n)
        spc = (0.78, 0.78, 1.0)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, shape, jnp.float32) * 200.0 - 600.0
        m = (jax.random.uniform(jax.random.PRNGKey(1), shape) > 0.25
             ).astype(jnp.float32)

        attempt = make_attempt(out, "benchmarks/out/r4_probe14.json")

        for sigma in (0.6, 1.2, 2.4, 3.5, 4.8):
            tag = f"{n}_s{sigma:g}"
            fits = _sweep_fits(sigma, spc, shape)
            out[f"sweep_fits_{tag}"] = fits
            if fits:
                attempt(f"sweep_ms_{tag}", lambda s=sigma: round(loop_time(
                    lambda v, mm: fused_features8_sweep(
                        v, mm, s, spc, stack=False)[0], x, m,
                    inner=12) * 1e3, 2))
            # staged: nc (sweep, tiled sweep, or einsum) + post_stream
            attempt(f"staged_ms_{tag}", lambda s=sigma: round(loop_time(
                lambda v, mm: fused_features8(
                    v, mm, s, spc, stack=False)[0], x, m,
                inner=12) * 1e3, 2))
            out[f"staged_nc_tiles_{tag}"] = (
                0 if _nc_sweep_fits(sigma, spc, shape)
                else (_nc_tile_plan(sigma, spc, shape) or -1))

        # components at the largest sigma: nc alone + post alone
        for sigma in (2.4, 4.8):
            tag = f"{n}_s{sigma:g}"
            if _nc_sweep_fits(sigma, spc, shape):
                attempt(f"nc_sweep_ms_{tag}", lambda s=sigma: round(
                    loop_time(
                        lambda v, mm: fused_normalized_conv_sweep(
                            v, mm, s, spc), x, m, inner=12) * 1e3, 2))
            else:
                nt = _nc_tile_plan(sigma, spc, shape)
                if nt:
                    attempt(f"nc_tiled{nt}_ms_{tag}", lambda s=sigma, t=nt:
                            round(loop_time(
                                lambda v, mm:
                                fused_normalized_conv_sweep_tiled(
                                    v, mm, s, spc, n_tiles=t), x, m,
                                inner=12) * 1e3, 2))
        attempt(f"post_stream_ms_{n}", lambda: round(loop_time(
            lambda v, mm: fused_features8_post_stream(
                v, mm, spc, stack=False)[0], x, m, inner=12) * 1e3, 2))

    with open("benchmarks/out/r4_probe14.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
