"""Pallas TPU kernels for the hot ops.

The reference runs each stencil as a separate ITK filter pass with
full-volume intermediates (SURVEY.md §3.1: ~20 volume-sized buffers per
scale). These kernels fuse the whole derivative + eigen-feature chain into
one HBM pass per block: read a halo-extended slab into VMEM, compute all
Hessian channels and the closed-form eigen features in registers, write the
feature channels — the memory-bound speed-of-light path.
"""
from ife_tpu.kernels.fused import (  # noqa: F401
    fused_features8,
    fused_features8_xs,
    fused_hessian_eig,
)
