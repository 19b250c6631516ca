"""Round-5 probe D: gate de-risk + end-to-end CLI timings.

  1. verify_on_chip() with the round-5 entries (dispatch-branch keyed,
     ys multi, sharded 1-device, fine-histogram equality) — the driver
     runs this at round end; it must pass here first.
  2. The packed-Gram fine histogram (one full-tile matmul instead of
     two quarter-tile dots) at 512^3.
  3. The 512^3 sharded bin-edges CLI wall time with the arithmetic/MXU
     fine histograms (round-4: 1m51s; VERDICT target <= ~60 s).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe21.py
"""
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks._timing import loop_time, make_attempt  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out",
                   "r5_probe21.json")


def main():
    out = {"device": jax.devices()[0].device_kind}
    attempt = make_attempt(out, OUT)

    # 1. the round-5 verify gate end to end
    def gate():
        sys.path.insert(0, "/root/repo")
        import bench

        return bench.verify_on_chip()

    attempt("verify_on_chip_r5", gate)

    # 2. packed-Gram fine histogram at 512^3
    from ife_tpu.stats.histogram import (
        snap_pow2_grid, uniform_histogram_counts,
    )

    key = jax.random.PRNGKey(0)
    shape5 = (512, 512, 512)
    x5 = jax.random.normal(key, shape5, jnp.float32) * 200.0 - 600.0
    m5 = (jax.random.uniform(jax.random.PRNGKey(2), shape5) > 0.25).astype(
        jnp.float32)
    w01 = (m5 != 0).astype(jnp.int32).ravel()
    mm_, kk_, bounds = snap_pow2_grid(-1100.0, 500.0, 4096)

    def fine_mxu(v, w, mf, wf):
        c = uniform_histogram_counts(
            v, w, mf + v.reshape(-1)[0] * jnp.asarray(0.0, jnp.float32),
            wf, 4096)
        return v + c.sum().astype(v.dtype) * jnp.asarray(0.0, v.dtype)

    attempt("fine_mxu_packed_4096_512_ms", lambda: round(loop_time(
        fine_mxu, x5, w01, jnp.float32(mm_),
        jnp.float32(np.ldexp(1.0, kk_)), inner=12) * 1e3, 3))

    # 3. the 512^3 sharded bin-edges CLI (same inputs/args as round 4)
    def cli():
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-m", "ife_tpu", "determine-bin-edges",
             "-l", "pairs.txt", "-o", "edges512_r5.txt",
             "-s", "1.0", "2.4", "--bins", "30", "--sharded",
             "--fine-bins", "4096"],
            cwd="/tmp/binedge_demo",
            env={**os.environ,
                 "PYTHONPATH": "/root/repo:/root/.axon_site"},
            capture_output=True, text=True, timeout=1800,
        )
        dt = time.time() - t0
        if p.returncode != 0:
            return {"error": (p.stderr or p.stdout)[-300:]}
        return {"wall_s": round(dt, 1)}

    attempt("binedges512_cli", cli)
    # second run: warm compilation cache — the steady-state number
    attempt("binedges512_cli_warm", cli)


if __name__ == "__main__":
    main()
