"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/pjit paths are
validated on a forced 8-device CPU host platform instead (the driver
separately dry-run-compiles the multi-chip path via __graft_entry__).
"""

import os
import sys

# FORCE cpu, don't setdefault: the ambient environment pins
# JAX_PLATFORMS=axon (the tunneled TPU transport), which wedges or
# errors whenever the tunnel is down — and the suite is CPU-only by
# design (SURVEY.md §4: correctness on CPU, perf tools on TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is correctness-only (perf numbers come from bench.py and
# tools/, which do NOT load this conftest): compile the test graphs at
# XLA:CPU optimization level 0 — measured 2.1x faster cold compiles on
# the heaviest serving-step test (60.7 -> 28.4 s) with all gates green.
# A/B-style bit-exactness tests compare functions compiled under the
# SAME level, so their discipline is unaffected.
if "xla_backend_optimization_level" not in flags:
    flags = flags + " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags
# A wedged axon transport can hang device discovery even with
# JAX_PLATFORMS=cpu (the plugin registers at sitecustomize time, before
# this file runs); drop its trigger variables too.
for _k in [k for k in os.environ if "AXON" in k.upper()]:
    os.environ.pop(_k, None)

# Persistent XLA compilation cache: the serving-step compiles dominate
# suite wall-clock (test_mixed_plan alone cost 10+ min cold in round 3);
# a warm cache turns reruns into O(seconds) per step variant.
# Load the machine-sig helper BY PATH: importing the opus_tpu package
# here would pull jax in before the env above is effective.
import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location(
    "_opus_tpu_cachedir",
    os.path.join(os.path.dirname(__file__), "..", "opus_tpu", "cachedir.py"),
)
_cachedir = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_cachedir)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cachedir.jax_cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The env vars above are too late when the ambient sitecustomize
# (PYTHONPATH=/root/.axon_site) has ALREADY imported jax to register the
# axon TPU plugin: jax snapshots JAX_PLATFORMS at import, so the suite
# would still try to initialize the axon backend — which fails hard once
# the AXON_* trigger vars are popped (pool-mode registration with its
# client env deleted).  Rewrite the live config too.
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
