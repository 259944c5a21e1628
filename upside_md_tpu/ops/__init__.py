from . import spline, geometry, sigmoid  # noqa: F401
