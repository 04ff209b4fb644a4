"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the platform before jax is imported anywhere (SURVEY.md SS4: the
fake backend for TPU testing is CPU with forced host device count).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# the container's sitecustomize imports jax and pins JAX_PLATFORMS=axon at
# interpreter start; override through the config API (backends are lazy)
import jax

jax.config.update("jax_platforms", "cpu")
