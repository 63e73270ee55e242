"""Dtype policy.

The CUDA reference is f64-only (`value_type = double`, common.h:21-59) with
i32 indices (`-DUSE_I32_INDEX`, config/config.mk:51). On TPU, f64 is
software-emulated and slow, so the framework is dtype-polymorphic: every
kernel derives its compute dtype from its inputs. Correctness tests run in
f64 on CPU (jax_enable_x64); TPU benchmarks run f32 by default.

Call :func:`enable_x64` once at program start for f64 runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Index dtype (reference: index_type = i32, common.h:21-59).
INDEX_DTYPE = np.int32


def enable_x64() -> None:
    """Enable 64-bit types globally (reference parity mode)."""
    jax.config.update("jax_enable_x64", True)


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_float() -> jnp.dtype:
    """f64 when x64 is enabled, else f32."""
    return jnp.dtype(jnp.float64) if x64_enabled() else jnp.dtype(jnp.float32)
