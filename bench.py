"""Benchmark: Hessian + closed-form eigen features, voxels/sec/chip.

The BASELINE.json metric ("Hessian+eig voxels/sec/chip at 512^3"). The
reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against a NumPy re-derivation of the same pipeline on the host CPU —
the honest single-node stand-in for the reference's ITK implementation.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "voxels/sec/chip", "vs_baseline": N}
"""
import json
import os
import sys
import time

import numpy as np

# persistent compilation cache: TPU compiles through the tunnel take
# minutes; cache them across bench runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _device_kind():
    import jax

    d = jax.devices()[0]
    return d.platform, d.device_kind


def bench_tpu(shape, inner=10, reps=3, use_fused=True):
    """Per-pass device time for the full feature-volume materialization.

    Timing through the axon tunnel is noisy (RPC floor ~25-45 ms,
    block_until_ready returns early, pool contention), so the kernel is
    invoked `inner` times INSIDE one jit with a serial data dependence
    (each pass consumes the previous pass's first output channel) and the
    loop is timed as a unit via a data-dependent scalar fetch; per-pass
    time = loop time / inner, best of `reps` (RPC jitter is amortized to
    noise/inner and can only inflate, never deflate, the result).
    """
    import jax
    import jax.numpy as jnp
    from ife_tpu.kernels.fused import fused_hessian_eig
    from ife_tpu.ops.features import hessian_eig_features

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, dtype=jnp.float32)
    x.block_until_ready()

    on_tpu = jax.devices()[0].platform == "tpu" and use_fused

    if on_tpu:
        def one_pass(v):
            return fused_hessian_eig(v, (0.78, 0.78, 1.0), stack=False)[0]
    else:
        def one_pass(v):
            return hessian_eig_features(v, (0.78, 0.78, 1.0))[..., 0]

    @jax.jit
    def loop(v):
        out = jax.lax.fori_loop(0, inner, lambda _, c: one_pass(c), v)
        return out[0, 0].sum()  # data-dependent completion witness

    float(loop(x))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(x))
        times.append(time.perf_counter() - t0)
    dt = min(times) / inner
    return float(np.prod(shape)) / dt


def bench_cpu_reference(shape=(128, 128, 128)):
    """Host-CPU NumPy re-derivation of the same math (tests/numpy_ref.py):
    proxy for the reference's single-node throughput."""
    sys.path.insert(0, ".")
    from tests import numpy_ref as ref

    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float64)
    t0 = time.perf_counter()
    H = ref.hessian_np(x, (0.78, 0.78, 1.0))
    ref.eig_features_np(H)
    dt = time.perf_counter() - t0
    return float(np.prod(shape)) / dt


def main():
    platform, kind = _device_kind()
    shape = (512, 512, 512) if platform == "tpu" else (128, 128, 128)
    try:
        vox_s = bench_tpu(shape)
    except Exception:
        try:  # fused kernel unavailable -> XLA-composed path
            vox_s = bench_tpu(shape, use_fused=False)
        except Exception:  # OOM headroom fallback
            shape = (384, 384, 384)
            vox_s = bench_tpu(shape, use_fused=False)
    cpu_vox_s = bench_cpu_reference()
    print(
        json.dumps(
            {
                "metric": f"hessian_eig_voxels_per_sec_chip_{shape[0]}cubed_{kind.replace(' ', '_')}",
                "value": round(vox_s, 1),
                "unit": "voxels/sec/chip",
                "vs_baseline": round(vox_s / cpu_vox_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
