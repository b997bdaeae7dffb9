"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the JAX analogue of a fake
distributed backend) so they are hermetic, deterministic, and leave the TPU
free. Env vars must be set before jax initializes, hence this runs at
conftest import time.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
# Parity tests compare against fp32 oracles.
os.environ.setdefault("MEC_COMPUTE_DTYPE", "float32")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
