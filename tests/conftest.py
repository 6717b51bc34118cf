"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container force-registers a remote-TPU ("axon") PJRT backend in every
python process via sitecustomize and pins ``JAX_PLATFORMS=axon`` at a level
that wins over the environment variable; that backend has multi-minute tunnel
latency, which is useless for unit tests. Backends initialize lazily, so
overriding via ``jax.config`` here — before any jax computation — reliably
selects CPU. Multi-chip sharding tests then run on 8 virtual CPU devices;
bench.py is what exercises the real chip.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
