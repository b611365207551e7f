from . import bands, dedup, enrich, extract, knn, pip_join, tile, zonal  # noqa: F401
