from . import (  # noqa: F401
    dedup,
    dissolve,
    knn,
    multimodal,
    similarity,
    spatial_join,
    tiles,
)
