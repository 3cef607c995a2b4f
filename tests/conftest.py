"""Test configuration: run everything on a virtual 8-device CPU mesh.

This replaces the reference's missing "fake cluster" layer (SURVEY.md §4):
sharding/collective code paths are exercised on
`--xla_force_host_platform_device_count=8` CPU devices without TPU hardware.
Must run before jax initializes its backends, hence env vars at import time.
"""

import os

# Force, don't setdefault: the ambient environment pins JAX_PLATFORMS to the
# axon TPU tunnel; unit tests must run on the virtual CPU mesh regardless.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
