"""Test configuration.

Force the CPU backend with 8 virtual devices so sharding tests exercise a
fake 8-chip mesh (the fake-pod pattern), and enable x64 for f64 oracles
(library code requests f32 explicitly).  The container's sitecustomize
imports jax at interpreter boot with JAX_PLATFORMS=axon (the remote-TPU
tunnel), so plain env vars are too late — use jax.config.update, which works
as long as no backend has been initialized yet.  bench.py and experiments
use the real chip; tests must not ride the tunnel.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
