from . import grid, s2  # noqa: F401
