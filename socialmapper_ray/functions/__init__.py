from . import geoparse, scalars, text  # noqa: F401
