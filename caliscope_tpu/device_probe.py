"""Out-of-process JAX platform probing.

The dev/CI image reaches one real TPU chip through a tunneled platform
plugin whose registration name has changed between rounds ("axon" in round
1, "tpu" later) and whose remote-compile service can wedge for hours (even
`x.sum()` on a device array hangs). Anything that wants the accelerator —
bench.py, the driver entry points — must therefore treat the ambient
`JAX_PLATFORMS` value as a hint, not a fact, and must probe WITHOUT
initializing this interpreter's backend (an initialized-then-hung backend
cannot fall back to CPU).

`resolve_jax_platform()` probes candidate JAX_PLATFORMS values in
subprocesses under a timeout and returns the first that completes a real
device op on a non-CPU backend, or None when only the CPU works.
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBE_CODE = (
    "import jax, jax.numpy as jnp; d = jax.devices(); "
    "assert float(jnp.ones(8).sum()) == 8.0; print('PROBE_OK', d[0].platform)"
)


def probe_platform(value: str, timeout_s: float) -> str | None:
    """Try JAX_PLATFORMS=value in a subprocess; return the resulting device
    platform name ('tpu', 'cpu', ...) or None on failure/timeout."""
    env = dict(os.environ, JAX_PLATFORMS=value)
    # force_host_platform flags would mask the accelerator under "" (auto)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" in flags:
        env["XLA_FLAGS"] = " ".join(
            f for f in flags.split() if "xla_force_host_platform_device_count" not in f
        )
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE], timeout=timeout_s, capture_output=True, text=True, env=env
        )
    except subprocess.TimeoutExpired:
        return None
    if out.returncode == 0:
        for line in out.stdout.splitlines():
            if line.startswith("PROBE_OK"):
                return line.split()[1]
    return None


def resolve_jax_platform(timeout_s: float | None = None) -> str | None:
    """Return a JAX_PLATFORMS value that yields a WORKING accelerator
    backend ("" = let JAX auto-choose), or None when no accelerator answers
    (caller should run on CPU).

    Candidates, in order: the ambient env value, "tpu", "" (auto). The env
    override CALISCOPE_PLATFORM_PROBE_TIMEOUT bounds each probe; a wedged
    tunnel costs at most len(candidates) * timeout before the CPU verdict.
    """
    if timeout_s is None:
        timeout_s = float(os.environ.get("CALISCOPE_PLATFORM_PROBE_TIMEOUT", 180))
    candidates = []
    ambient = os.environ.get("JAX_PLATFORMS")
    if ambient and ambient != "cpu":
        candidates.append(ambient)
    for c in ("tpu", ""):
        if c not in candidates:
            candidates.append(c)
    for cand in candidates:
        plat = probe_platform(cand, timeout_s)
        if plat is not None and plat != "cpu":
            return cand
    return None


def _pin_config(value: str) -> None:
    """Mirror the env decision into jax.config — the TPU plugin has been
    observed to IGNORE the JAX_PLATFORMS env var (its init then retries
    against a dead tunnel in a sleep loop); only the config update reliably
    pins the backend. Safe pre- or post-import, no-op if a backend is
    already initialized."""
    try:
        import jax

        jax.config.update("jax_platforms", value or None)
    except Exception:
        pass


def apply_resolved_platform(logger=None) -> bool:
    """Resolve and export a working platform into this process's env AND
    jax config (before any JAX backend init). Returns True when an
    accelerator was found; False means CPU was pinned."""
    resolved = resolve_jax_platform()
    if resolved is None:
        if logger:
            logger("no working accelerator backend (tunnel down or renamed); using CPU")
        os.environ["JAX_PLATFORMS"] = "cpu"
        _pin_config("cpu")
        return False
    if resolved != os.environ.get("JAX_PLATFORMS"):
        if logger:
            logger(f"JAX_PLATFORMS={os.environ.get('JAX_PLATFORMS')!r} not usable; switching to {resolved!r}")
    os.environ["JAX_PLATFORMS"] = resolved
    _pin_config(resolved)
    return True
