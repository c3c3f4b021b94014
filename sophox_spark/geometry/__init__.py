from . import core, cover, pip, simplify, strtree, wkb  # noqa: F401
