from ife_tpu.cli.main import main  # noqa: F401
