"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the JAX analogue of a fake
distributed backend) so they are hermetic, deterministic, and leave the TPU
free.

Environment note: this container's sitecustomize registers the remote
`axon` TPU backend at interpreter start and forces jax_platforms to
"axon,cpu" — plain JAX_PLATFORMS=cpu is overridden. The reliable override
is jax.config.update('jax_platforms', 'cpu') before any device is created,
which is done here (conftest imports before all tests).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
# Parity tests compare against fp32 oracles.
os.environ.setdefault("MEC_COMPUTE_DTYPE", "float32")
# No persistent compile cache in tests: CPU AOT results are machine-
# feature-specific and the suite's virtual-mesh shapes would pollute the
# serving cache.
os.environ["MEC_JAX_CACHE_DIR"] = ""
# Keep the default database (trainer metric records etc.) out of the repo.
import tempfile  # noqa: E402
os.environ.setdefault(
    "DATABASE_URL",
    "sqlite:///" + os.path.join(tempfile.mkdtemp(prefix="mec_test_db"),
                                "emotion.db"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import mec_tpu  # noqa: E402,F401  (applies the fp32 matmul-precision policy)
