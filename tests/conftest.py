"""Test configuration.

Forces JAX onto a virtual 8-device CPU backend (the reference pattern for
testing distributed code paths single-process — see SURVEY.md §4) and
enables float64 so finite-difference gradient checks are meaningful."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import jax

# the axon sitecustomize force-registers the TPU backend; override it
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
