"""Test harness: force the JAX CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a fake 8-device mesh
(xla_force_host_platform_device_count) so the suite is deterministic and
does not require a TPU pod (SURVEY §4 multi-chip test row).
Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
