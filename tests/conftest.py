"""Test configuration: run everything on a virtual 8-device CPU mesh.

This replaces the reference's missing "fake cluster" layer (SURVEY.md §4):
sharding/collective code paths are exercised on 8 virtual CPU devices without
TPU hardware.

jax 0.9 note: the old `--xla_force_host_platform_device_count` XLA flag is a
no-op, and the ambient axon TPU plugin overrides the `JAX_PLATFORMS=cpu` env
var. The only mechanism that works in this environment is the config pair
below, applied before any backend initializes (verified: `jax.devices()` then
reports 8 TFRT_CPU devices).
"""

import os

# Harmless belt-and-braces for subprocesses spawned by tests.
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)

# Persistent compilation cache: the suite's wall time is dominated by
# re-compiling the same tiny-model XLA programs every run; with the cache
# warm, repeat runs skip compilation entirely.
_cache_dir = os.environ.get(
    'UDAOD_JAX_CACHE',
    os.path.join(os.path.expanduser('~/.cache'), 'udaod_tpu', 'jax_cache'))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
