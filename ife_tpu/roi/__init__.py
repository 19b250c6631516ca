from ife_tpu.roi.generate import (  # noqa: F401
    ROI,
    generate_random_rois,
    generate_dense_rois,
)
from ife_tpu.roi.bag import make_bag  # noqa: F401
