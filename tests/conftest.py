"""Test configuration: force a clean 8-device virtual CPU mesh.

Two environment hazards are handled here:
  1. The ambient environment may set JAX_PLATFORMS to a remote TPU
     tunnel — unit tests must run on CPU.
  2. A sitecustomize shim (activated by PALLAS_AXON_POOL_IPS) patches
     JAX's compile path for the tunnel and deadlocks CPU-only
     compilation. It runs at interpreter startup, before conftest, so
     the only reliable fix is to re-exec pytest once with the shim
     disabled.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and os.environ.get("_TGX_CLEAN") != "1":
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["_TGX_CLEAN"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    # Drop the shim's site dir from PYTHONPATH; keep the repo importable.
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join([repo] + parts)
    import subprocess

    raise SystemExit(
        subprocess.run(
            [sys.executable, "-m", "pytest"] + sys.argv[1:], env=env
        ).returncode
    )

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Conformance-grade tests request float64 explicitly; without x64 JAX
# silently downcasts them to f32 (observed as ~1e-8 error in what
# should be 1e-12-exact analytic marginals). Enable it globally so a
# single-file test run behaves like the full suite; f32 paths request
# their dtype explicitly and are unaffected.
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
