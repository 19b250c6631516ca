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
    fused_features8_post_stream,
    fused_features8_sweep,
    fused_features8_sweep_multi,
    fused_features8_xs_stream,
    fused_features8_ys_multi,
    fused_hessian_eig,
    fused_hessian_eig_stream,
    fused_normalized_conv_sweep,
    fused_normalized_conv_sweep_tiled,
)

# NOT exported: fused_features8_xs / fused_features8_tap — intermediate
# rungs of the fusion ladder (docs/design.md), superseded by
# fused_features8_sweep and dispatched by nothing. They remain importable
# from ife_tpu.kernels.fused for the record (they were measured and
# verified on chip) but are not public API.
