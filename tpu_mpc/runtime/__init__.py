from . import wire, state_machine  # noqa: F401


def apply_platform_env() -> None:
    """Make JAX_PLATFORMS authoritative for CLI processes.

    The axon TPU plugin registers itself regardless of the JAX_PLATFORMS env
    var; multiple CLI client processes would then contend for the single
    chip.  Call this at the top of every CLI main() (before any jax op) so
    `JAX_PLATFORMS=cpu demo/run.sh` really runs the clients on CPU.
    """
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
