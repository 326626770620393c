"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is JAX's standard fake-cluster mechanism (SURVEY.md section 4). Two
subtleties of this environment:
  * a sitecustomize hook registers a remote-TPU PJRT plugin and pins
    ``jax_platforms="axon,cpu"`` via jax.config at interpreter start, so
    env vars alone cannot select CPU — we update jax.config directly;
  * the host-device-count flag must be set before the CPU backend is
    first initialized (it is read at client-creation time).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if jax._src.xla_bridge.backends_are_initialized():  # pragma: no cover
    from jax.extend.backend import clear_backends

    clear_backends()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
