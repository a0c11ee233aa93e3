"""Shared bootstrap for tools/ scripts run as ``python tools/<x>.py``.

Two environment facts every tool needs handled (and that round-4 found
copy-pasted, or missing, per file):

- the package is not pip-installed and Python puts the SCRIPT's
  directory (tools/), not the cwd, on sys.path — so the repo root must
  be inserted for ``import dbcsr_tpu`` to resolve;
- the environment pins ``JAX_PLATFORMS=axon`` through a sitecustomize,
  so the env var alone cannot select a backend — honor it explicitly
  via jax.config before first backend use (enables CPU smoke runs of
  every chip tool; harmless on chip).

Usage (first import in the tool, before dbcsr_tpu/jax usage):

    import _bootstrap  # noqa: F401
"""
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

# DBCSR_PLATFORM (the package-level selector, see dbcsr_tpu/__init__.py)
# wins over the ambient JAX_PLATFORMS, which this environment pins to
# axon for every process.
_plat = os.environ.get("DBCSR_PLATFORM") or os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)
