from . import extract, normalize, textstats, ttl  # noqa: F401
