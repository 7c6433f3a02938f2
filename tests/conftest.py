"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere.
"""

import os

# Force CPU: the ambient environment may point JAX_PLATFORMS at a real
# accelerator (e.g. a remote TPU tunnel), which would make eager test
# dispatch pathologically slow and defeat the virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A sitecustomize hook may have force-registered an accelerator plugin before
# this file ran (ignoring JAX_PLATFORMS); override the platform explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compile cache for the suite: the wall clock is dominated by
# XLA CPU compiles of full train steps (60-400 s each on this 1-core box);
# identical compiles dedupe across tests and reruns are near-instant.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_cpu",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="read-only reference checkout not mounted at /root/reference",
)


@pytest.fixture(scope="session")
def ref_point_utils():
    """Load the reference's torch point_utils as a parity oracle (CPU torch)."""
    import importlib.util

    path = os.path.join(REFERENCE_DIR, "models", "point_utils.py")
    spec = importlib.util.spec_from_file_location("ref_point_utils", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
