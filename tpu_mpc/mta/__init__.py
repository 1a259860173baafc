from . import mta  # noqa: F401
