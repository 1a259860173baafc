from . import wire, state_machine  # noqa: F401
