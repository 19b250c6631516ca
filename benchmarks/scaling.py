"""Scaling benchmark: sharded Hessian+eig over 1..N devices.

BASELINE.md configs call for voxels/sec at 1 chip / 1 host / N hosts with
>=0.9 scaling efficiency. Only one physical chip is reachable in this
environment, so this script measures:
  * real numbers on whatever devices exist (1 TPU chip, or N CPU devices),
  * the communication structure (halo exchange volume per step) that
    determines multi-chip efficiency.

Timing is LOOP-AMORTIZED (the probe3 method: N serial passes inside one
jit with a data dependence, fetch one scalar, divide by N) — plain
block_until_ready returns early through the axon tunnel (CLAUDE.md), and
even on CPU the amortized form removes dispatch noise.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/scaling.py --shape 256 --out SCALING_CPU8.json
     PYTHONPATH=/root/repo:/root/.axon_site \
       python benchmarks/scaling.py --shape 512 --out SCALING_TPU1.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, default=256)
    ap.add_argument("--inner", type=int, default=6,
                    help="serial passes inside the timing jit")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--out", default=None,
                    help="also append result records to this JSON file")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ife_tpu.parallel import make_mesh, shard_volume, sharded_hessian_eig

    n_all = jax.device_count()
    platform = jax.devices()[0].platform
    shape = (args.shape,) * 3
    records = []
    base = None
    for n in [d for d in (1, 2, 4, 8, 16) if d <= n_all]:
        mesh = make_mesh(n, ("x",) if n <= 2 else ("x", "y"))
        key = jax.random.PRNGKey(0)
        x = shard_volume(
            jax.random.normal(key, shape, dtype=jnp.dtype(args.dtype)), mesh
        )

        @jax.jit
        def loop(v):
            def body(_, c):
                # stack=False: time the op, not a trailing lane-axis
                # relayout (a size-6 channel-last stack costs ~2x the
                # kernel pass itself)
                return sharded_hessian_eig(
                    c, mesh, (0.78, 0.78, 1.0), stack=False)[0]
            return jax.lax.fori_loop(0, args.inner, body, v)[0, 0].sum()

        float(loop(x))  # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(loop(x))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / args.inner
        vox_s = float(np.prod(shape)) / dt
        eff = 1.0 if base is None else vox_s / (base * n)
        if base is None:
            base = vox_s
        rec = {
            "platform": platform,
            "shape": list(shape),
            "devices": n,
            "mesh": dict(zip(mesh.axis_names,
                             (int(v) for v in mesh.devices.shape))),
            "ms_per_pass": round(dt * 1e3, 3),
            "voxels_per_sec": round(vox_s, 1),
            "scaling_efficiency": round(eff, 3),
            "timing": f"loop-amortized inner={args.inner} best-of-{args.reps}",
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
