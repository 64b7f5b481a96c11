"""Test configuration: force a deterministic 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices (no TPU pod needed),
mirroring how the driver dry-runs `__graft_entry__.dryrun_multichip`.

The ambient environment pins jax to the remote TPU tunnel (the axon
sitecustomize calls jax.config.update("jax_platforms", "axon") at interpreter
start, which overrides the JAX_PLATFORMS env var), so we must override the
*config* here, before any backend is initialized — env vars alone are not
enough. Eager per-op dispatch over the tunnel is also ~1s/op, so tests must
run on host CPU.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compiles of the unrolled NTT/Poseidon
# graphs dominate test wall-clock on small hosts; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/zkevm_prover_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------------------
# Test tiers: the default suite must stay under the CI budget (~5 min on a
# 1-core host); everything marked `slow` needs ZK_SLOW=1. The slow tier is
# the reference's "config-activated test" role (SURVEY.md §4) — full-size
# proves, heavy XLA compiles, production-shape circuits.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy compile/prove; excluded unless ZK_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("ZK_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: set ZK_SLOW=1")
    for item in items:
        if item.get_closest_marker("slow"):
            item.add_marker(skip)
