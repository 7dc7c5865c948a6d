"""Test configuration: CPU backend, 8 virtual devices, float64.

The reference's parity tests run in Float64 on CPU (test/runtests.jl with
Julia's default f64); we mirror that — TPU hardware runs f32/bf16 and is
exercised by bench.py.  The 8 virtual CPU devices provide the multi-device
fake-backend layer the reference lacks (SURVEY.md §4c).

Note: this environment's sitecustomize imports jax and registers the 'axon'
TPU plugin before pytest starts, so JAX_PLATFORMS in os.environ is already
consumed — we must override through jax.config instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_enable_fast_math" not in _flags:
    # XLA:CPU fast-math (default ON) applies non-IEEE rewrites that void the
    # df32 error-free transforms (see newtonkrylov_tpu/df32.py warning); the
    # TPU compiler needs no flag.
    _flags = (_flags + " --xla_cpu_enable_fast_math=false").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
