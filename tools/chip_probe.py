#!/usr/bin/env python
"""Minimal axon-chip liveness probe: one tiny bf16 matmul on the default
(TPU) platform. Exits 0 iff the tunnel answers; run under `timeout` —
a hung tunnel blocks forever (see memory note axon-tunnel-serialization)."""
import jax
import jax.numpy as jnp

print(jax.devices())
x = jnp.ones((256, 256), jnp.bfloat16)
print("probe ok:", float((x @ x).sum()))
