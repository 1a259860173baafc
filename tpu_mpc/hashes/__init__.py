from . import fiat_shamir  # noqa: F401
