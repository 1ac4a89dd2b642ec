"""Test configuration: force an 8-device virtual CPU mesh.

Tests must not depend on TPU hardware; the multi-chip sharding paths are
exercised on a virtual CPU mesh exactly as the driver's dryrun does.
The environment may preset JAX_PLATFORMS (e.g. to the TPU platform), so
this must override, not setdefault. Set GBLASTN_TEST_PLATFORM to opt
out (e.g. to run the suite on real TPU).
"""
import os

os.environ["JAX_PLATFORMS"] = os.environ.get("GBLASTN_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# No persistent compile cache under the suite: cold cache-entry writes
# of giant XLA:CPU programs have segfaulted the process late in a run
# (see utils/cache.enable_compilation_cache)
os.environ.setdefault("GBLASTN_TPU_NO_COMPILE_CACHE", "1")

# The TPU tunnel plugin registers itself regardless of JAX_PLATFORMS and
# becomes the default backend; route default computations to the virtual
# CPU devices so the suite is hardware-independent and fast.
import jax  # noqa: E402

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass
