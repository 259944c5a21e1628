from .logger import H5Logger  # noqa: F401
