"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so that every sharded code path
(observation-axis data parallelism, distributed LM reductions) is exercised
without TPU pod hardware — the JAX analog of the reference's synthetic-scene
substitution for hardware fixtures (see /root/reference/tests/conftest.py).

Must set env vars BEFORE jax is imported anywhere.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Force CPU + x64 for tests even when the ambient environment selects a TPU
# platform plugin (which overrides JAX_PLATFORMS at import time). Override
# with CALISCOPE_TPU_TEST_PLATFORM for on-device runs: "tpu" (or "auto" /
# "device") PROBES for the working accelerator platform name out of process
# — the tunneled plugin has registered as "axon" or "tpu" depending on the
# environment, so the literal value cannot be trusted (pinning
# jax_platforms="tpu" on an axon image fails with "No ... device found").
import jax  # noqa: E402

_platform = os.environ.get("CALISCOPE_TPU_TEST_PLATFORM", "cpu")
if _platform in ("tpu", "auto", "device"):
    import importlib.util as _ilu

    _spec = _ilu.spec_from_file_location(
        "_caliscope_device_probe",
        os.path.join(os.path.dirname(__file__), "..", "caliscope_tpu", "device_probe.py"),
    )
    _probe = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_probe)
    _resolved = _probe.resolve_jax_platform()
    if _resolved is None:
        raise RuntimeError(
            "CALISCOPE_TPU_TEST_PLATFORM requested an accelerator but no "
            "working backend answered the probe (wedged tunnel?)"
        )
    os.environ["JAX_PLATFORMS"] = _resolved
    _platform = _resolved
jax.config.update("jax_platforms", _platform or None)
# x64 only on CPU: TPU has no f64 compute, and x64 mode leaks i64 scalars
# into Pallas kernels (Mosaic's dynamic_rotate requires i32 shifts) — the
# production TPU path never enables it either.
jax.config.update("jax_enable_x64", _platform == "cpu")

# Persistent compilation cache: the suite's walltime is dominated by x64-CPU
# recompiles of the same solver programs across test processes; warm runs
# skip them entirely. The directory is keyed by platform + jaxlib version:
# processes where the TPU platform plugin initializes bake different XLA CPU
# target flags (+prefer-no-scatter) into CPU AOT entries than plugin-less
# processes, and loading an entry across that boundary has produced
# machine-feature-mismatch errors up to SIGILL (observed 2026-08-18 after
# the plugin's registration name changed and it stopped initializing).
import jaxlib  # noqa: E402

_cache_key = f"{os.environ.get('CALISCOPE_TPU_TEST_PLATFORM', 'cpu')}_{jaxlib.__version__}"
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", f"/tmp/caliscope_jax_cache_tests_{_cache_key}"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
