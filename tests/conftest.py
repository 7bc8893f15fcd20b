"""Test harness: run on CPU with 8 virtual devices (the analog of the
reference's oversubscribed-MPI CTest setup, SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session may preset 'axon' (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# The environment's sitecustomize registers the TPU plugin and sets
# jax_platforms to "axon,cpu" regardless of JAX_PLATFORMS — override it so
# tests really run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8

REFERENCE_DIR = "/root/reference"
MESH_DIR = os.path.join(REFERENCE_DIR, "meshes")


def reference_mesh(name: str) -> str:
    return os.path.join(MESH_DIR, name)
