from . import flagship, relational, spatial, textops  # noqa: F401
