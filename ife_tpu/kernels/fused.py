"""Fused Hessian + symmetric-3x3 eigen-feature Pallas kernel.

Replaces the XLA-composed chain (ife_tpu.ops.stencil.hessian ->
ife_tpu.ops.eigen.eigenvalue_features) for the hot path: instead of
materializing dx, dy and the 6 Hessian channels in HBM (~6 extra
volume-sized round trips), each grid step DMAs one halo-extended (BX+2,
BY+2, Z) slab into VMEM, computes all six second derivatives (central
differences, cascaded cross terms — semantics of reference
Hessian3DImageFilter.hxx:19-59) and the closed-form trigonometric
eigenvalues (reference Symmetric3x3EigenvalueSolver.h:33-132, same select
network as ife_tpu.ops.eigen) on the VPU, and writes the 6 feature
channels. HBM traffic = read X*Y*Z + write 6*X*Y*Z, the lower bound.

Output is channel-FIRST (6, X, Y, Z): the channel axis must not land on
the TPU lane dimension, and downstream consumers (histograms, masking)
read whole channels contiguously.
"""
from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ife_tpu.ops.eigen import eigenvalue_features


def _clamp_shift_z(s: jnp.ndarray, off: int) -> jnp.ndarray:
    """s shifted by `off` along the last (lane) axis with edge clamp."""
    if off == -1:
        return jnp.concatenate([s[..., :1], s[..., :-1]], axis=-1)
    if off == 1:
        return jnp.concatenate([s[..., 1:], s[..., -1:]], axis=-1)
    raise ValueError(off)


def _kernel(x_hbm, out_ref, scratch, sem, *, bx, by, hx, hy, hz):
    i = pl.program_id(0)
    j = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * bx, bx + 2), pl.ds(j * by, by + 2), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    s = scratch[:]  # (bx+2, by+2, Z)
    dt = s.dtype
    # divide (not multiply-by-reciprocal): bitwise-identical rounding with
    # ops.stencil.derivative, so fused and XLA paths agree to the last ulp
    h2x = jnp.asarray(2 * hx, dt)
    h2y = jnp.asarray(2 * hy, dt)
    h2z = jnp.asarray(2 * hz, dt)
    hx2 = jnp.asarray(hx, dt) * jnp.asarray(hx, dt)
    hy2 = jnp.asarray(hy, dt) * jnp.asarray(hy, dt)
    hz2 = jnp.asarray(hz, dt) * jnp.asarray(hz, dt)

    core = s[1:-1, 1:-1, :]
    dxx = (s[2:, 1:-1, :] - 2 * core + s[:-2, 1:-1, :]) / hx2
    dyy = (s[1:-1, 2:, :] - 2 * core + s[1:-1, :-2, :]) / hy2
    dzz = (_clamp_shift_z(core, 1) - 2 * core + _clamp_shift_z(core, -1)) / hz2

    # cascaded cross derivatives (two radius-1 passes, like the reference)
    dx = (s[2:, :, :] - s[:-2, :, :]) / h2x          # (bx, by+2, Z)
    dxy = (dx[:, 2:, :] - dx[:, :-2, :]) / h2y       # (bx, by, Z)
    dx_c = dx[:, 1:-1, :]
    dxz = (_clamp_shift_z(dx_c, 1) - _clamp_shift_z(dx_c, -1)) / h2z
    dy = (s[1:-1, 2:, :] - s[1:-1, :-2, :]) / h2y    # (bx, by, Z)
    dyz = (_clamp_shift_z(dy, 1) - _clamp_shift_z(dy, -1)) / h2z

    H = jnp.stack([dxx, dxy, dxz, dyy, dyz, dzz], axis=-1)
    # use_trig=False: Pallas TPU has no acos lowering; the Newton trisection
    # path is mul/add/sqrt only and matches trig to ~1e-15
    feats = eigenvalue_features(H, use_trig=False)
    out_ref[:] = jnp.moveaxis(feats, -1, 0)


def _pick_block(n: int, target: int) -> int:
    """Largest divisor of n that is <= target (block sizes must divide)."""
    b = min(target, n)
    while n % b:
        b -= 1
    return b


@functools.partial(
    jax.jit, static_argnames=("spacing", "block", "interpret")
)
def fused_hessian_eig(
    x: jax.Array,
    spacing: Sequence[float] = (1.0, 1.0, 1.0),
    block: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Six eigen features of the Hessian, one fused pass.

    Args:
      x: (X, Y, Z) float32 volume.
      spacing: physical voxel spacing (hx, hy, hz).
      block: target block edge for the X/Y grid.
      interpret: run the Pallas interpreter (CPU testing).

    Returns:
      (6, X, Y, Z): [e1, e2, e3, LoG, GaussianCurvature, FrobeniusNorm],
      eigenvalues ordered |e3| <= |e2| <= |e1| — channel-first layout
      (see module docstring); jnp.moveaxis(out, 0, -1) matches
      eigenvalue_features(hessian(x)).
    """
    X, Y, Z = x.shape
    bx = _pick_block(X, block)
    by = _pick_block(Y, block)
    hx, hy, hz = (float(s) for s in spacing)

    # pre-pad with edge replication so interior windows never clamp and true
    # edges get ZeroFluxNeumann — one cheap fused pad pass
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")

    kernel = functools.partial(_kernel, bx=bx, by=by, hx=hx, hy=hy, hz=hz)
    return pl.pallas_call(
        kernel,
        grid=(X // bx, Y // by),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (6, bx, by, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((6, X, Y, Z), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bx + 2, by + 2, Z), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
