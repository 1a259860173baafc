from . import sigma  # noqa: F401
