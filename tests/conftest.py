"""Test configuration: force an 8-device virtual CPU platform so
multi-chip sharding semantics are testable without TPU hardware
(SURVEY.md §4 'Distributed without a cluster')."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
