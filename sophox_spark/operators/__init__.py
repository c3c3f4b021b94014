from . import dissolve, knn, spatial_join, tiles  # noqa: F401
