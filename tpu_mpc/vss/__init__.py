from . import feldman  # noqa: F401
