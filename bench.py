"""Benchmark: Hessian + closed-form eigen features, voxels/sec/chip.

The BASELINE.json metric ("Hessian+eig voxels/sec/chip at 512^3"). The
reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against a PINNED NumPy re-derivation of the same pipeline on the host CPU
(BASELINE_CPU.json, median of 5 recorded runs — the honest single-node
stand-in for the reference's ITK implementation; pinned so the multiplier
does not swing with host load).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "voxels/sec/chip", "vs_baseline": N,
   "verify": {...on-chip fused-vs-XLA parity report...}}

The verify block is the on-chip regression gate: interpreter-mode tests
cannot catch Mosaic lowering faults (round 2 proved they are real — see
docs/design.md on fused_features8_full), so the bench the driver runs
fails loudly if any fused kernel diverges from the XLA-composed ops on
the real device.
"""
import functools
import json
import os
import sys
import time

import numpy as np

# persistent compilation cache: TPU compiles through the tunnel take
# minutes; cache them across bench runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

_BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BASELINE_CPU.json")


def _device_kind():
    import jax

    d = jax.devices()[0]
    return d.platform, d.device_kind


def _loop_time(fn, x, *rest, inner=32, reps=3, stats=False):
    """Per-pass device time via the loop-amortized method: `inner` serial
    passes inside ONE jit (each pass consumes the previous output), one
    data-dependent scalar fetched, divided by inner — the only timing
    that survives the axon tunnel's RPC jitter (block_until_ready returns
    early through the tunnel; single-shot wall timing is noisy to ±2x).
    inner must be LARGE: probe11 measured a ~26 ms fixed cost per loop
    invocation (the RPC round trip), so inner=8 overstates a 10 ms pass
    by ~30%; inner=32 bounds the bias at ~1 ms.
    `rest` are constant jit PARAMETERS (never close over big device
    arrays — they embed in the compile payload and the tunnel rejects it,
    HTTP 413).

    stats=True returns (best, median, worst) per-pass seconds across the
    reps so the artifact carries the tunnel-variance spread (round-4
    VERDICT weak-6: the README and driver numbers disagreed by ~3%
    with no recorded spread to reconcile them)."""
    import jax

    shape = x.shape

    @jax.jit
    def loop(v, *r):
        def body(_, c):
            out = fn(c, *r)
            return out if out.shape == shape else out[..., 0]
        return jax.lax.fori_loop(0, inner, body, v)[0, 0].sum()

    float(loop(x, *rest))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(x, *rest))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    if stats:
        return (ts[0] / inner, ts[len(ts) // 2] / inner, ts[-1] / inner)
    return ts[0] / inner


def bench_tpu(shape, inner=32, reps=5, use_fused=True):
    """(best, median, worst) voxels/sec for the full feature-volume
    materialization — best-of-N with the spread recorded so the headline
    is reconcilable against any single driver run."""
    import jax
    import jax.numpy as jnp
    from ife_tpu.kernels.fused import fused_hessian_eig_stream
    from ife_tpu.ops.features import hessian_eig_features

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, dtype=jnp.float32)
    x.block_until_ready()

    on_tpu = jax.devices()[0].platform == "tpu" and use_fused

    if on_tpu:
        # streaming-halo kernel, block=2: 9.07 ms vs the windowed kernel's
        # 9.54 at 512^3 (benchmarks/out/r3_batch4.txt)
        def one_pass(v):
            return fused_hessian_eig_stream(
                v, (0.78, 0.78, 1.0), block=2, stack=False)[0]
    else:
        def one_pass(v):
            return hessian_eig_features(v, (0.78, 0.78, 1.0))[..., 0]

    best, med, worst = _loop_time(one_pass, x, inner=inner, reps=reps,
                                  stats=True)
    n = float(np.prod(shape))
    return n / best, n / med, n / worst


def cpu_baseline_voxels_per_sec():
    """Pinned host-NumPy re-derivation throughput (BASELINE_CPU.json);
    falls back to a live measurement only if the artifact is missing."""
    try:
        with open(_BASELINE_FILE) as f:
            return float(json.load(f)["voxels_per_sec"]), "pinned"
    except Exception:
        return bench_cpu_reference(), "measured_live"


def bench_cpu_reference(shape=(128, 128, 128)):
    """Live host-CPU NumPy re-derivation (tests/numpy_ref.py). Normally
    unused — the pinned BASELINE_CPU.json value is preferred."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests import numpy_ref as ref

    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float64)
    t0 = time.perf_counter()
    H = ref.hessian_np(x, (0.78, 0.78, 1.0))
    ref.eig_features_np(H)
    dt = time.perf_counter() - t0
    return float(np.prod(shape)) / dt


def verify_on_chip(shape=(128, 128, 128), spacing=(0.78, 0.78, 1.0)):
    """On-chip regression: EVERY fused Pallas kernel the product can
    dispatch vs the XLA-composed ops on the real device (interpreter-mode
    tests can't catch Mosaic lowering regressions — round 2's
    fused_features8_full proved the failure mode).

    Coverage (the full dispatch surface of features8_auto /
    normalized_convolution_auto / the sharded wrappers):
      * fused_features8_sweep at sigma=1.0 AND sigma=3.5 (the large-radius
        ring/roll-tap regime);
      * fused_normalized_conv_sweep at sigma=4.8 (the staged path's
        smoothing stage at large sigma);
      * fused_features8_post_stream, plain and pre_padded (the staged
        path's tail + the sharded features8 per-shard kernel);
      * fused_hessian_eig (windowed, public API) and
        fused_hessian_eig_stream, plain and via the halo-extended
        slice trick (the sharded hessian_eig per-shard path).

    Channels 0,1 (smoothed, |grad|) and 5,6,7 (the symmetric eigenvalue
    functions) must agree tightly; eigen channels 2-4 are compared as
    VALUE-SORTED triples because the |e|-ordering legitimately swaps at
    near-ties in f32 (any implementation, including the reference's).
    Returns a dict of max relative errors; raises AssertionError on fail.
    """
    import jax
    import jax.numpy as jnp
    from ife_tpu.kernels.fused import (
        fused_features8_post_stream, fused_features8_sweep,
        fused_hessian_eig, fused_hessian_eig_stream,
        fused_normalized_conv_sweep,
    )
    from ife_tpu.ops.features import features8, hessian_eig_features
    from ife_tpu.ops.stencil import normalized_gaussian_convolution

    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, shape, jnp.float32) * 200.0 - 600.0
    msk = (jax.random.uniform(jax.random.PRNGKey(1), shape) > 0.25).astype(
        jnp.float32)

    def sweep_errs(v, m, sigma):
        a = jnp.moveaxis(fused_features8_sweep(v, m, sigma, spacing,
                                               stack=True), 0, -1)
        b = features8(v, m, sigma, spacing)
        scale = jnp.maximum(jnp.abs(b).reshape(-1, 8).max(axis=0), 1.0)
        direct = jnp.abs(a - b).reshape(-1, 8).max(axis=0) / scale
        ea = jnp.sort(a[..., 2:5], axis=-1)
        eb = jnp.sort(b[..., 2:5], axis=-1)
        eig = jnp.abs(ea - eb).max() / jnp.maximum(jnp.abs(eb).max(), 1.0)
        return direct, eig

    @jax.jit
    def errs(v, m):
        out = {}
        for sig, tag in ((1.0, ""), (3.5, "_s35")):
            direct, eig = sweep_errs(v, m, sig)
            out["smoothed" + tag] = direct[0]
            out["gradmag" + tag] = direct[1]
            out["log" + tag] = direct[5]
            out["gausscurv" + tag] = direct[6]
            out["frobenius" + tag] = direct[7]
            out["eig_sorted_features8" + tag] = eig
        # normalized-conv sweep at sigma past the features-sweep range,
        # compared inside the mask support (nan outside in both, like the
        # reference's no-epsilon divide)
        nc = fused_normalized_conv_sweep(v, m, 4.8, spacing)
        ncw = normalized_gaussian_convolution(v, m, 4.8, spacing)
        inside = m != 0
        nce = jnp.abs(jnp.where(inside, nc - ncw, 0.0)).max() / \
            jnp.maximum(jnp.abs(jnp.where(inside, ncw, 0.0)).max(), 1.0)
        out["nc_sweep_s48"] = nce
        # post-stream kernel, plain + pre_padded, vs the composed op
        s = normalized_gaussian_convolution(v, m, 1.0, spacing)
        b = features8(v, m, 1.0, spacing)
        scale = jnp.maximum(jnp.abs(b).reshape(-1, 8).max(axis=0), 1.0)
        ps = jnp.moveaxis(
            fused_features8_post_stream(s, m, spacing, stack=True), 0, -1)
        dps = jnp.abs(jnp.where(inside[..., None], ps - b, 0.0)
                      ).reshape(-1, 8).max(axis=0) / scale
        out["post_stream_smoothed"] = dps[0]
        out["post_stream_frobenius"] = dps[7]
        se = jnp.pad(s, ((1, 1), (1, 1), (0, 0)), mode="edge")
        pp = jnp.moveaxis(fused_features8_post_stream(
            se, m, spacing, stack=True, pre_padded=True), 0, -1)
        dpp = jnp.abs(jnp.where(inside[..., None], pp - b, 0.0)
                      ).reshape(-1, 8).max(axis=0) / scale
        out["post_stream_prepad_frobenius"] = dpp[7]
        out["post_stream_prepad_eig_sorted"] = jnp.abs(
            jnp.sort(pp[..., 2:5], -1) - jnp.sort(b[..., 2:5], -1)
        ).max() / jnp.maximum(jnp.abs(b[..., 2:5]).max(), 1.0)
        # hessian+eig kernels vs composed op
        hb = jnp.sort(hessian_eig_features(v, spacing)[..., :3], axis=-1)
        hscale = jnp.maximum(jnp.abs(hb).max(), 1.0)
        ha = jnp.sort(jnp.stack(
            fused_hessian_eig(v, spacing, stack=False)[:3], -1), axis=-1)
        out["eig_sorted_hessian_eig"] = jnp.abs(ha - hb).max() / hscale
        sa = jnp.sort(jnp.stack(
            fused_hessian_eig_stream(v, spacing, block=2,
                                     stack=False)[:3], -1), axis=-1)
        out["eig_sorted_hessian_eig_stream"] = jnp.abs(sa - hb).max() / hscale
        # the sharded per-shard paths: (a) stream kernel on a
        # halo-extended block, core sliced back out (2D meshes);
        # (b) the ext_halo VARIANT (x-halo rows as separate kernel
        # inputs — 1D meshes / SCALING_TPU1) — a different Mosaic
        # program that must be verified on chip in its own right
        ve = jnp.pad(v, ((1, 1), (1, 1), (0, 0)), mode="edge")
        xa = fused_hessian_eig_stream(ve, spacing, block=2, stack=False)
        xa = jnp.sort(jnp.stack([o[1:-1, 1:-1, :] for o in xa[:3]], -1),
                      axis=-1)
        out["eig_sorted_stream_ext_slice"] = jnp.abs(xa - hb).max() / hscale
        ha2 = fused_hessian_eig_stream(
            v, spacing, block=2, stack=False,
            x_halo=(v[:1], v[-1:]))  # edge rows == the clamp replicas
        ha2 = jnp.sort(jnp.stack(ha2[:3], -1), axis=-1)
        out["eig_sorted_stream_x_halo"] = jnp.abs(ha2 - hb).max() / hscale
        ph = jnp.moveaxis(fused_features8_post_stream(
            s, m, spacing, stack=True,
            x_halo=(s[:1], s[-1:])), 0, -1)
        dph = jnp.abs(jnp.where(inside[..., None], ph - b, 0.0)
                      ).reshape(-1, 8).max(axis=0) / scale
        out["post_stream_x_halo_frobenius"] = dph[7]
        # the Pallas histogram kernel vs a definitional searchsorted +
        # scatter oracle (fine at this small shape): exact integer
        # equality expected
        from ife_tpu.kernels.histogram import histogram_counts_pallas

        e = jnp.linspace(-1100.0, 300.0, 31)
        w = (m != 0).ravel().astype(jnp.int32)
        hp = histogram_counts_pallas(v.ravel(), e, w)
        idx = jnp.searchsorted(e, v.ravel(), side="left")
        ref_counts = jnp.zeros(e.shape[0] + 1, jnp.int32).at[idx].add(w)
        out["hist_pallas_max_abs_count_err"] = jnp.abs(
            hp - ref_counts).max().astype(jnp.float32)
        # the multi-channel form must agree bit-for-bit
        from ife_tpu.kernels.histogram import histogram_counts_multi

        hm = histogram_counts_multi([v.ravel(), s.ravel()], e, weights=w)
        hs = histogram_counts_pallas(s.ravel(), e, w)
        out["hist_multi_max_abs_count_err"] = jnp.maximum(
            jnp.abs(hm[0] - hp).max(), jnp.abs(hm[1] - hs).max()
        ).astype(jnp.float32)
        return out

    report = {k: float(v) for k, v in errs(img, msk).items()}

    # ---- the DISPATCH entry points end to end (round-4 VERDICT weak-4:
    # the gate must verify what features8_auto actually dispatches, keyed
    # by branch so it cannot drift from the dispatch table) ----
    from ife_tpu.ops.features import (
        features8_auto_channels, features8_dispatch_branch,
        multiscale_features8_fused,
    )

    @functools.partial(jax.jit, static_argnames=("sigma",))
    def auto_errs(v, m, *, sigma):
        a = jnp.stack(
            features8_auto_channels(v, m, sigma, spacing), axis=-1)
        b = features8(v, m, sigma, spacing)
        scale = jnp.maximum(jnp.abs(b).reshape(-1, 8).max(axis=0), 1.0)
        d = jnp.abs(a - b).reshape(-1, 8).max(axis=0) / scale
        eig = jnp.abs(jnp.sort(a[..., 2:5], -1)
                      - jnp.sort(b[..., 2:5], -1)).max() / \
            jnp.maximum(jnp.abs(b[..., 2:5]).max(), 1.0)
        return jnp.maximum(jnp.max(d[jnp.array([0, 1, 5, 6, 7])]), eig)

    branches = {}
    for sig in (1.0, 2.4, 4.8):
        br = features8_dispatch_branch(sig, spacing, shape)
        branches[sig] = br
        report[f"auto_s{sig}[{br}]"] = float(
            auto_errs(img, msk, sigma=sig))
    # the three gate sigmas must straddle the crossovers: if a dispatch
    # change collapses them onto fewer branches, the gate fails loudly
    # instead of silently narrowing its coverage
    assert len(set(branches.values())) >= 3, branches

    # UNALIGNED shape (Y % 8 != 0, Z % 128 != 0): the true-face padding
    # clamp family hid for two rounds precisely because every gate and
    # bench shape was alignment-friendly (the sweep kernels smooth the
    # alignment padding in-kernel; the stencil must still clamp at the
    # TRUE faces — round-5 fixes). This entry keeps the padding path
    # exercised on real hardware forever.
    img_u = img[:, :124, :120]
    msk_u = msk[:, :124, :120]
    bru = features8_dispatch_branch(1.0, spacing, img_u.shape)
    report[f"auto_unaligned_s1.0[{bru}]"] = float(
        auto_errs(img_u, msk_u, sigma=1.0))

    # the one-launch multi-scale ys path (config 3 / in-kernel MXU
    # smoothing): both scales vs the XLA-composed op
    @jax.jit
    def ys_errs(v, m):
        g = multiscale_features8_fused(v, m, (2.4, 4.8), spacing,
                                       stack=True)
        errs = []
        for si, s in enumerate((2.4, 4.8)):
            b = features8(v, m, s, spacing)
            a = jnp.moveaxis(g[si], 0, -1)
            scale = jnp.maximum(jnp.abs(b).reshape(-1, 8).max(axis=0), 1.0)
            d = jnp.abs(a - b).reshape(-1, 8).max(axis=0) / scale
            eig = jnp.abs(jnp.sort(a[..., 2:5], -1)
                          - jnp.sort(b[..., 2:5], -1)).max() / \
                jnp.maximum(jnp.abs(b[..., 2:5]).max(), 1.0)
            errs.append(jnp.maximum(
                jnp.max(d[jnp.array([0, 1, 5, 6, 7])]), eig))
        return jnp.stack(errs)

    ys = ys_errs(img, msk)
    report["ys_multi_s2.4[in-kernel-mxu]"] = float(ys[0])
    report["ys_multi_s4.8[in-kernel-mxu]"] = float(ys[1])

    # the SHARDED per-shard paths through sharded_features8 itself (a
    # 1-device mesh runs the real shard_map block: halo exchange, the
    # per-shard sweep kernel, and the x_halo post_stream variant)
    from jax.sharding import Mesh
    from ife_tpu.parallel.features import sharded_features8

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("x",))

    @functools.partial(jax.jit, static_argnames=("sigma",))
    def shard_cmp(a_t, v, m, *, sigma):
        a = jnp.stack(a_t, axis=-1)
        b = features8(v, m, sigma, spacing)
        scale = jnp.maximum(jnp.abs(b).reshape(-1, 8).max(axis=0), 1.0)
        d = jnp.abs(a - b).reshape(-1, 8).max(axis=0) / scale
        eig = jnp.abs(jnp.sort(a[..., 2:5], -1)
                      - jnp.sort(b[..., 2:5], -1)).max() / \
            jnp.maximum(jnp.abs(b[..., 2:5]).max(), 1.0)
        return jnp.maximum(jnp.max(d[jnp.array([0, 1, 5, 6, 7])]), eig)

    for sig in (1.0, 2.4):
        sh = sharded_features8(img, msk, sig, mesh1, spacing, stack=False)
        br = ("sharded_block_sweep" if sig == 1.0
              else "sharded_staged_x_halo")
        report[f"sharded_s{sig}[{br}]"] = float(
            shard_cmp(sh, img, msk, sigma=sig))

    # the arithmetic/MXU fine histogram vs the compare-reduce kernel on
    # the SAME snapped grid: integer equality on chip
    from ife_tpu.stats.histogram import (
        snap_pow2_grid, uniform_histogram_counts,
    )

    from ife_tpu.kernels.histogram import histogram_counts_pallas

    mfh, kfh, bounds = snap_pow2_grid(-1100.0, 500.0, 4096)
    w01 = (msk != 0).astype(jnp.int32).ravel()
    a = uniform_histogram_counts(
        img, w01, jnp.float32(mfh), jnp.float32(np.ldexp(1.0, kfh)), 4096)
    raw = histogram_counts_pallas(
        img.ravel(), jnp.asarray(bounds, jnp.float32), w01)
    b = raw[1:4097].at[0].add(raw[0])
    report["fine_hist_mxu_max_abs_count_err"] = float(
        jnp.abs(a - b).max())

    for k, v in report.items():
        assert v < 1e-4, (k, v, report)
    return report


def _dump(detail, out_path):
    """Write the artifact after EVERY config: a TPU worker crash in a
    later config (config4's scatter histogram killed the worker twice)
    must not lose the measured results."""
    with open(out_path, "w") as fobj:
        json.dump(detail, fobj, indent=1)


def bench_all(out_path="BENCH_DETAIL.json", resume=False):
    """BASELINE.md configs 1-4 measured end-to-end; written as one JSON
    artifact after EVERY config (config 5, >=2 hosts, is covered by
    tests/test_multiprocess.py and benchmarks/scaling.py — one physical
    chip is reachable here). resume=True: reload an existing artifact and
    only run configs it is missing (TPU-worker crashes in one config must
    not force re-measuring the others)."""
    import jax
    import jax.numpy as jnp

    platform, kind = _device_kind()
    on_tpu = platform == "tpu"
    detail = {"device": kind, "platform": platform}
    if resume:
        try:
            with open(out_path) as fobj:
                detail.update(json.load(fobj))
        except Exception:
            pass

    def have(n):
        return resume and any(k.startswith(f"config{n}_") for k in detail)

    from ife_tpu.ops.eigen import eigenvalue_features
    from ife_tpu.ops.features import features8, features8_dispatch_branch
    from ife_tpu.kernels.fused import (
        fused_features8, fused_features8_sweep, fused_hessian_eig_stream,
    )
    from ife_tpu.ops.features import hessian_eig_features

    key = jax.random.PRNGKey(0)

    # config 1: eigen solver on a synthetic 64^3 Hessian field. The eigen
    # output is (..., 6); feed channel 0 back as all six inputs for the
    # serial dependence.
    if not have(1):
        H = jax.random.normal(key, (64, 64, 64, 6), jnp.float32)

        def eig_pass(h):
            e = eigenvalue_features(h)
            return jnp.broadcast_to(e[..., :1], h.shape)

        dt = _loop_time(lambda h: eig_pass(h), H, inner=64)
        detail["config1_eigen_64cubed_voxels_per_sec"] = round(64 ** 3 / dt, 1)
        print("config1 done:", detail, file=sys.stderr, flush=True)
        _dump(detail, out_path)

    # config 2: single-scale Hessian features + eigen, 128^3
    if not have(2):
        x128 = jax.random.normal(key, (128, 128, 128), jnp.float32)
        fn2 = (lambda v: fused_hessian_eig_stream(v, (0.78, 0.78, 1.0), block=2, stack=False)[0]) \
            if on_tpu else (lambda v: hessian_eig_features(v, (0.78, 0.78, 1.0))[..., 0])
        dt = _loop_time(fn2, x128)
        detail["config2_hessian_eig_128cubed_voxels_per_sec"] = round(128 ** 3 / dt, 1)
        print("config2 done:", detail, file=sys.stderr, flush=True)
        _dump(detail, out_path)

    spc = (0.78, 0.78, 1.0)

    def one_scale8(v, m, s):
        # tuple form on TPU: no channel-last stack/moveaxis copies (at
        # 512^3 those are 2 extra 4.3 GB materializations per pass and
        # crashed the TPU worker via HBM exhaustion)
        if not on_tpu:
            return tuple(jnp.moveaxis(features8(v, m, s, spc), -1, 0))
        # the SAME single-source branch helper features8_auto and the
        # verify gate use
        k = (fused_features8_sweep
             if features8_dispatch_branch(s, spc, v.shape) == "sweep"
             else fused_features8)
        return k(v, m, s, spc, stack=False)

    if not have(3):
        # config 3: multi-scale (4 sigma) features8, 256^3 synthetic CT.
        # The mask is a jit PARAMETER of the timing loop (closing over a big
        # device array embeds it in the compile payload -> HTTP 413).
        shape3 = (256, 256, 256) if on_tpu else (64, 64, 64)
        x256 = jax.random.normal(key, shape3, jnp.float32) * 200.0 - 600.0
        m256 = (jax.random.uniform(jax.random.PRNGKey(1), shape3) > 0.25).astype(
            jnp.float32)
        scales = (0.6, 1.2, 2.4, 4.8)

        def multi(v, m):
            outs = [one_scale8(v, m, s)[0] for s in scales]
            return jnp.stack(outs, 0).sum(0)

        dt = _loop_time(multi, x256, m256, inner=12)
        vox4 = float(np.prod(shape3)) * len(scales)
        detail["config3_per_scale_voxels_per_sec"] = round(vox4 / dt, 1)
        best = dt
        if on_tpu:
            # the one-launch multi-scale composition: sweeps for the two
            # small scales + the ys kernel (in-kernel banded MXU y
            # smoothing) for the two large ones — the round-5 fix for the
            # per-kernel launch costs r4_probe17 attributed config 3's
            # ceiling to
            from ife_tpu.ops.features import multiscale_features8_fused
            from ife_tpu.kernels.fused import fused_features8_sweep

            def multi_fused(v, m):
                outs = [fused_features8_sweep(v, m, s, spc,
                                              stack=False)[0]
                        for s in (0.6, 1.2)]
                g = multiscale_features8_fused(v, m, (2.4, 4.8), spc,
                                               stack=False)
                outs += [g[0][0], g[1][0]]
                return jnp.stack(outs, 0).sum(0)

            dtf = _loop_time(multi_fused, x256, m256, inner=12)
            detail["config3_fused_voxels_per_sec"] = round(vox4 / dtf, 1)
            best = min(best, dtf)
        detail["config3_multiscale4_features8_voxels_per_sec"] = round(
            vox4 / best, 1)
        detail["config3_shape"] = list(shape3)
        print("config3 done:", detail, file=sys.stderr, flush=True)
        _dump(detail, out_path)

    if on_tpu and (not resume or "verify_on_chip" not in detail):
        # verify BEFORE config 4: a TPU-worker crash there must not cost
        # the parity record
        detail["verify_on_chip"] = verify_on_chip()
        _dump(detail, out_path)
    if not have(4):
        try:
            # config 4: features8 + device histograms at 512^3 (the make-bag /
            # bin-edges on-device stage), loop-amortized like the rest.
            # The histogram is the round-4 TPU-native compare-reduce
            # (stats/histogram.py): the round-3 scatter lowering measured
            # 33.8 s for this stage and OOM-crashed the worker when
            # composed with the feature pass.
            shape4 = (512, 512, 512) if on_tpu else (64, 64, 64)
            x512 = jax.random.normal(key, shape4, jnp.float32) * 200.0 - 600.0
            m512 = (jax.random.uniform(jax.random.PRNGKey(2), shape4) > 0.25).astype(
                jnp.float32)
            from ife_tpu.stats.histogram import histogram_counts

            edges = jnp.linspace(-1200.0, 600.0, 31)

            # Stage-separated timing (the product execution shape:
            # determine-bin-edges materializes the feature volumes, then
            # bins them).
            def feat_pass(v, m):
                return one_scale8(v, m, 1.0)[0]

            dt_feat = _loop_time(feat_pass, x512, m512, inner=12)

            f8 = one_scale8(x512, m512, 1.0)
            f8 = [jnp.asarray(c) for c in f8]
            w512 = m512.ravel().astype(jnp.int32)

            def hist8(v, w, e, *chans):
                # every histogram must be LOOP-CARRIED or XLA hoists the
                # (loop-invariant) channel binnings out of the timing
                # loop and the stage reads 9x too fast (caught round 4:
                # 11 ms "measured" vs ~40 real — the composed one-jit
                # and the standalone probe16 agree on ~40). The carried
                # dependence rides through the EDGES (a tiny SMEM input):
                # f32*0 of a carried value cannot be folded (inf/nan).
                e_t = e + v.reshape(-1)[0] * jnp.asarray(0.0, v.dtype)
                if on_tpu:
                    # one multi-channel pass: the mask stream is read
                    # once for all nine channels
                    from ife_tpu.kernels.histogram import (
                        histogram_counts_multi,
                    )

                    counts = histogram_counts_multi(
                        list(chans) + [v], e_t, weights=w)
                else:
                    counts = jnp.stack(
                        [histogram_counts(c.ravel(), e_t, weights=w)
                         for c in chans]
                        + [histogram_counts(v.ravel(), e_t, weights=w)]
                    )
                return v + counts.sum().astype(v.dtype) * jnp.asarray(
                    0.0, v.dtype)

            dt_hist = _loop_time(hist8, f8[0], w512, edges, *f8[1:],
                                 inner=12)
            dt = dt_feat + dt_hist
            detail["config4_feat_ms"] = round(dt_feat * 1e3, 2)
            detail["config4_hist_ms"] = round(dt_hist * 1e3, 2)
            detail["config4_features_plus_hist_512cubed_voxels_per_sec"] = \
                round(float(np.prod(shape4)) / dt, 1)
            detail["config4_shape"] = list(shape4)
            print("config4 done:", detail, file=sys.stderr, flush=True)
            _dump(detail, out_path)

            # The ONE-JIT composition (features -> histograms, no
            # intermediate fetch) — the exact program shape that crashed
            # the round-3 TPU worker five times with the scatter
            # histogram. Timed to document the root cause is gone.
            def composed(v, m, e):
                chans = one_scale8(v, m, 1.0)
                w = (m != 0).ravel().astype(jnp.int32)
                counts = jnp.stack(
                    [histogram_counts(c.ravel(), e, weights=w)
                     for c in chans])
                return v + counts.sum().astype(v.dtype) * jnp.asarray(
                    0.0, v.dtype)

            dtc = _loop_time(composed, x512, m512, edges, inner=12)
            detail["config4_composed_one_jit_ms"] = round(dtc * 1e3, 2)
            print("config4 composed done:", detail, file=sys.stderr,
                  flush=True)
            _dump(detail, out_path)
        except Exception as e:  # worker crashes must not lose the artifact
            detail["config4_error"] = f"{type(e).__name__}: {str(e)[:160]}"
            _dump(detail, out_path)
            print(json.dumps(detail))
            return
    with open(out_path, "w") as fobj:
        json.dump(detail, fobj, indent=1)
    print(json.dumps(detail))


def main():
    if "--verify" in sys.argv:
        report = verify_on_chip()
        print(json.dumps({"verify": "ok", **report}))
        return
    if "--all" in sys.argv:
        bench_all(resume="--resume" in sys.argv)
        return
    platform, kind = _device_kind()
    shape = (512, 512, 512) if platform == "tpu" else (128, 128, 128)
    try:
        stats = bench_tpu(shape)
    except Exception:
        try:  # fused kernel unavailable -> XLA-composed path
            stats = bench_tpu(shape, use_fused=False)
        except Exception:  # OOM headroom fallback
            shape = (384, 384, 384)
            stats = bench_tpu(shape, use_fused=False)
    vox_best, vox_med, vox_worst = stats
    cpu_vox_s, baseline_kind = cpu_baseline_voxels_per_sec()
    result = {
        "metric": f"hessian_eig_voxels_per_sec_chip_{shape[0]}cubed_{kind.replace(' ', '_')}",
        # the MEDIAN is the headline (reproducible under tunnel
        # variance); best/worst record the spread so README, design.md
        # and any driver-captured BENCH_r*.json can be reconciled
        "value": round(vox_med, 1),
        "unit": "voxels/sec/chip",
        "vs_baseline": round(vox_med / cpu_vox_s, 2),
        "baseline": baseline_kind,
        "spread": {"best": round(vox_best, 1), "worst": round(vox_worst, 1),
                   "reps": 5},
    }
    # on-chip parity gate: a Mosaic lowering regression fails the bench
    # instead of silently shipping (docs/design.md, full-fusion post-mortem)
    if platform == "tpu":
        result["verify"] = verify_on_chip()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
