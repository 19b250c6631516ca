"""Shared probe timing harness — the loop-amortized method (CLAUDE.md).

One copy of the load-bearing measurement logic: N serial passes chained
inside ONE jit via lax.fori_loop (each pass consumes the previous
output), one data-dependent scalar fetched, divide by N. Through the
axon tunnel each loop INVOCATION carries a ~26 ms fixed RPC cost
(probe11), so `inner` must be large enough that the fixed cost is noise
relative to inner * per-pass-time: inner=32 for ~10 ms passes, inner=12
acceptable for ~30+ ms passes (bias <= ~2 ms).
"""
from __future__ import annotations

import json
import time


def loop_time(fn, x, *rest, inner=32, reps=3):
    """Per-pass device seconds for fn(x, *rest) (rest are constant jit
    parameters — never close over big device arrays, HTTP 413)."""
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
    return min(ts) / inner


def make_attempt(out: dict, path: str):
    """Record-and-continue measurement wrapper: runs thunk, stores the
    result (or the error string) under key, rewrites the JSON artifact
    after EVERY measurement so compile failures lose nothing."""
    def attempt(key, thunk):
        try:
            out[key] = thunk()
        except Exception as e:  # noqa: BLE001 — compile OOMs etc.
            out[key] = f"ERROR {type(e).__name__}: {str(e)[:120]}"
        print(key, out[key], flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    return attempt
