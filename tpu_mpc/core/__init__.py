from . import limbs, bigint, montgomery  # noqa: F401
