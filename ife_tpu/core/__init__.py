from ife_tpu.core.volume import Volume  # noqa: F401
