from .reader import load_system  # noqa: F401
