"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the JAX-idiomatic way: XLA host devices
emulate an 8-chip slice (SURVEY.md §4 implication; the driver separately
dry-runs `__graft_entry__.dryrun_multichip`).

Note: the sandbox's sitecustomize registers an "axon" TPU plugin and forces
jax_platforms programmatically, so the env var alone is not enough — we
override the config after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
