from ife_tpu.ops.eigen import eigenvalues_sym3x3, eigenvalue_features  # noqa: F401
