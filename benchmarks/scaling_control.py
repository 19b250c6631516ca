"""Scaling-collapse attribution experiment (round-4, VERDICT Weak-4).

SCALING_CPU8.json shows efficiency 0.963 at 2 virtual CPU devices, then
0.532 at 4 and 0.262 at 8. Two hypotheses:
  (a) program structure — the halo exchange / collective pattern stops
      scaling;
  (b) host-core saturation — 8 virtual XLA:CPU devices time-share the
      same physical cores, so per-device throughput must fall once the
      per-device compute no longer fills spare cores.

This script separates them with two controls, same shape/timing method as
benchmarks/scaling.py:
  1. CONTROL-NOHALO: the identical per-shard stencil+eigen compute under
     shard_map but with NO halo exchange (each shard treats its block
     edges as volume edges — numerically different at block seams,
     structurally identical otherwise). If this collapses like the real
     op, the collapse is not the communication's fault.
  2. CONTROL-THREADS: the SAME single-device computation on the full
     volume, measured with the host's full thread pool (n=1 row of the
     main scaling table) — the per-core roofline the virtual devices
     compete for.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/scaling_control.py --shape 256 \
       --out SCALING_CONTROL_CPU8.json
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _time_loop(loop, x, inner, reps):
    float(loop(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / inner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, default=256)
    ap.add_argument("--inner", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from ife_tpu.parallel import make_mesh, shard_volume
    from ife_tpu.parallel import features as pf
    from ife_tpu.parallel.mesh import volume_pspec

    shape = (args.shape,) * 3
    spc = (0.78, 0.78, 1.0)
    n_all = jax.device_count()
    records = []

    def nohalo_op(x, mesh):
        """Same per-shard stencil+eigen compute, ZERO communication: each
        block clamps at its own edges (sharded_axes={} -> edge pads)."""
        pspec = volume_pspec(mesh)

        def block(img):
            _, H = pf._grad_hessian_block(img, {}, spc)
            from ife_tpu.ops.eigen import eigenvalue_features

            e = eigenvalue_features(H)
            return tuple(e[..., k] for k in range(6))

        fn = shard_map(block, mesh=mesh, in_specs=(pspec,),
                       out_specs=(pspec,) * 6, check_vma=False)
        return fn(x)

    base = {}
    for kind in ("halo", "nohalo"):
        base[kind] = None
        for n in [d for d in (1, 2, 4, 8) if d <= n_all]:
            mesh = make_mesh(n, ("x",) if n <= 2 else ("x", "y"))
            x = shard_volume(
                jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32),
                mesh)

            if kind == "halo":
                def one(c, _mesh=mesh):
                    return pf.sharded_hessian_eig(
                        c, _mesh, spc, stack=False)[0]
            else:
                def one(c, _mesh=mesh):
                    return nohalo_op(c, _mesh)[0]

            @jax.jit
            def loop(v, _one=one):
                def body(_, c):
                    return _one(c)
                return jax.lax.fori_loop(0, args.inner, body, v)[0, 0].sum()

            dt = _time_loop(loop, x, args.inner, args.reps)
            vox_s = float(np.prod(shape)) / dt
            eff = 1.0 if base[kind] is None else vox_s / (base[kind] * n)
            if base[kind] is None:
                base[kind] = vox_s
            rec = {
                "kind": kind, "devices": n,
                "ms_per_pass": round(dt * 1e3, 3),
                "voxels_per_sec": round(vox_s, 1),
                "scaling_efficiency": round(eff, 3),
            }
            records.append(rec)
            print(json.dumps(rec), flush=True)

    # host thread-pool probe: the same full-volume computation, whole
    # machine — documents the per-host roofline the virtual devices share
    from ife_tpu.ops.features import hessian_eig_features

    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)

    @jax.jit
    def loop1(v):
        def body(_, c):
            return hessian_eig_features(c, spc)[..., 0]
        return jax.lax.fori_loop(0, args.inner, body, v)[0, 0].sum()

    dt = _time_loop(loop1, x, args.inner, args.reps)
    rec = {
        "kind": "single_device_full_threadpool",
        "ms_per_pass": round(dt * 1e3, 3),
        "voxels_per_sec": round(float(np.prod(shape)) / dt, 1),
        "ncpu": os.cpu_count(),
    }
    records.append(rec)
    print(json.dumps(rec), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
