"""Round-5 probe G: int8 vs bf16 one-hot operands for the fine
histogram's MXU accumulation (v5e int8 rate is 2x bf16; exactness is
trivial for 0/1 operands and CPU-verified).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe24.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks._timing import loop_time, make_attempt  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out",
                   "r5_probe24.json")


def main():
    out = {"device": jax.devices()[0].device_kind}
    attempt = make_attempt(out, OUT)

    import ife_tpu.stats.histogram as H

    key = jax.random.PRNGKey(0)
    shape5 = (512, 512, 512)
    x5 = jax.random.normal(key, shape5, jnp.float32) * 200.0 - 600.0
    m5 = (jax.random.uniform(jax.random.PRNGKey(2), shape5) > 0.25).astype(
        jnp.float32)
    w01 = (m5 != 0).astype(jnp.int32).ravel()
    mm_, kk_, bounds = H.snap_pow2_grid(-1100.0, 500.0, 4096)

    def fine(v, w, mf, wf):
        c = H.uniform_histogram_counts(
            v, w, mf + v.reshape(-1)[0] * jnp.asarray(0.0, jnp.float32),
            wf, 4096)
        return v + c.sum().astype(v.dtype) * jnp.asarray(0.0, v.dtype)

    results = {}
    for dt, tag in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        H._ONEHOT_DTYPE = dt
        jax.clear_caches()
        attempt(f"fine_{tag}_4096_512_ms", lambda: round(loop_time(
            fine, x5, w01, jnp.float32(mm_),
            jnp.float32(np.ldexp(1.0, kk_)), inner=12) * 1e3, 3))
        results[tag] = np.asarray(H.uniform_histogram_counts(
            x5, w01, jnp.float32(mm_), jnp.float32(np.ldexp(1.0, kk_)),
            4096)).astype(np.int64)
    if len(results) == 2:
        out["int8_vs_bf16_max_abs_diff"] = int(
            np.abs(results["int8"] - results["bf16"]).max())
        with open(OUT, "w") as f:
            import json
            json.dump(out, f, indent=1)
        print("diff", out["int8_vs_bf16_max_abs_diff"])


if __name__ == "__main__":
    main()
