from . import secp256k1  # noqa: F401
