"""Test configuration: run everything on CPU jaxlib with a virtual
8-device mesh so multi-chip sharding paths compile and execute without
TPU hardware (BASELINE configs[0]).

The image's sitecustomize registers the 'axon' TPU backend at
interpreter start and pins JAX_PLATFORMS=axon, so env vars alone don't
switch platforms — use jax.config before any backend initialisation.
TPU execution is covered by bench.py and the driver's compile checks.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def run_async(coro):
    """Run a coroutine on a fresh loop, then drain pending tasks so
    stream pumps shut down cleanly (no teardown warnings)."""
    import asyncio

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(coro)
    finally:
        pending = asyncio.all_tasks(loop)
        for t in pending:
            t.cancel()
        if pending:
            loop.run_until_complete(asyncio.gather(*pending, return_exceptions=True))
        loop.close()
