from . import gg18  # noqa: F401
