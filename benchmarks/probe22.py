"""Round-5 probe E: attribute the bin-edges CLI's wall time stage by
stage (round 4 blamed the fine histograms; r5_probe21 showed the CLI
time barely moves when they get 7.8x faster — so what IS it?), re-run
the fixed verify gate, and confirm the reverted two-dot fine histogram.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe22.py
"""
import os
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
                   "r5_probe22.json")


def main():
    out = {"device": jax.devices()[0].device_kind}
    attempt = make_attempt(out, OUT)

    # 1. the fixed round-5 verify gate
    def gate():
        sys.path.insert(0, "/root/repo")
        import bench

        return bench.verify_on_chip()

    attempt("verify_on_chip_r5", gate)

    # 2. reverted two-dot fine histogram (sanity after the Gram revert)
    from ife_tpu.stats.histogram import (
        snap_pow2_grid, uniform_histogram_counts,
    )

    key = jax.random.PRNGKey(0)
    shape5 = (512, 512, 512)
    x5 = jax.random.normal(key, shape5, jnp.float32) * 200.0 - 600.0
    m5 = (jax.random.uniform(jax.random.PRNGKey(2), shape5) > 0.25).astype(
        jnp.float32)
    w01 = (m5 != 0).astype(jnp.int32).ravel()
    mm_, kk_, _bounds = snap_pow2_grid(-1100.0, 500.0, 4096)

    def fine_mxu(v, w, mf, wf):
        c = uniform_histogram_counts(
            v, w, mf + v.reshape(-1)[0] * jnp.asarray(0.0, jnp.float32),
            wf, 4096)
        return v + c.sum().astype(v.dtype) * jnp.asarray(0.0, v.dtype)

    attempt("fine_mxu_twodot_4096_512_ms", lambda: round(loop_time(
        fine_mxu, x5, w01, jnp.float32(mm_),
        jnp.float32(np.ldexp(1.0, kk_)), inner=12) * 1e3, 3))

    # 3. stage-by-stage CLI body attribution (the exact
    #    determine-bin-edges sharded loop, perf_counter per stage)
    def cli_stages():
        from ife_tpu.io.volume_io import read_volume
        from ife_tpu.parallel.mesh import (
            make_mesh, pad_to_mesh, shard_volume,
        )
        from ife_tpu.parallel.features import sharded_features8
        from ife_tpu.parallel.stats import masked_fine_histogram

        stages = {}

        def t(name, fn):
            t0 = time.perf_counter()
            r = fn()
            stages[name] = round(time.perf_counter() - t0, 2)
            return r

        mesh = make_mesh(1, ("x",), devices=jax.devices()[:1])
        vol = t("load_img", lambda: read_volume(
            "/tmp/binedge_demo/img512.nii.gz"))
        msk = t("load_msk", lambda: read_volume(
            "/tmp/binedge_demo/msk512.nii.gz"))
        fg = t("isin_mask", lambda: np.isin(
            np.asarray(msk.data), np.asarray([1])).astype(np.uint8))

        def shard_all():
            img_p, orig = pad_to_mesh(jnp.asarray(
                np.asarray(vol.data), jnp.float32), mesh)
            mskf, _ = pad_to_mesh(jnp.asarray(fg), mesh)
            a = shard_volume(img_p, mesh)
            b = shard_volume(mskf, mesh)
            a.block_until_ready()
            return a, b

        img_s, msk_s = t("pad_and_shard", shard_all)

        for s in (1.0, 2.4):
            feats = t(f"features_s{s}", lambda s=s: jax.block_until_ready(
                sharded_features8(img_s, msk_s, float(s), mesh,
                                  (0.78, 0.78, 1.0), stack=False)))
            for c in range(8):
                t(f"hist_s{s}_c{c}", lambda c=c: masked_fine_histogram(
                    feats[c], msk_s, mesh, 4096))
        stages["total"] = round(sum(stages.values()), 1)
        return stages

    attempt("cli_stage_attribution", cli_stages)


if __name__ == "__main__":
    main()
