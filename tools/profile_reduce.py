"""Microbenchmark: point-keyed segment reductions on the TPU.

Measures the solver's hottest reduction (PROFILE.md item 1: ~10 ms of a
~30 ms LM iteration) under the candidate lowerings, with the chained-timing
methodology (data-dependent reps inside ONE jit — see MEMORY notes):

  a. segment_sum, unsorted rows           (round-1 baseline)
  b. segment_sum, sorted rows, flag off   (locality only)
  c. segment_sum, sorted rows, indices_are_sorted=True   (round-2 production)
  d. .at[].add scatter                    (reference point)
  e. Schur G segment-sum keyed pt-major (sorted) vs cam-major (unsorted)

Run: PYTHONPATH=/root/repo python tools/profile_reduce.py   (TPU via resolver)
"""

from __future__ import annotations

import os
import signal
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import importlib.util

spec = importlib.util.spec_from_file_location(
    "_dp", os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "caliscope_tpu", "device_probe.py")
)
_dp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_dp)
if not _dp.apply_resolved_platform(logger=print):
    print("no accelerator; CPU numbers only")

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("N_OBS", 141_422))
P = int(os.environ.get("N_PTS", 35_000))
C = int(os.environ.get("N_CAMS", 8))
W = 12
CHAIN = int(os.environ.get("CHAIN", 10))
TIMEOUT = int(os.environ.get("TIMEOUT", 420))


def _alarm(sig, frm):
    raise TimeoutError("section timed out")


signal.signal(signal.SIGALRM, _alarm)


def timed(label, fn, *args):
    @jax.jit
    def prog(*a):
        seed = jnp.float32(0.0)
        out = jnp.float32(0.0)
        for _ in range(CHAIN):
            r = fn(*[x * (1.0 + seed * 1e-30) if x.dtype == jnp.float32 else x for x in a])
            red = jnp.sum(r) * 1e-30
            out = out + red
            seed = red
        return out

    signal.alarm(TIMEOUT)
    try:
        float(prog(*args))
        t0 = time.perf_counter()
        float(prog(*args))
        dt = (time.perf_counter() - t0) / CHAIN
    except TimeoutError:
        print(f"{label:48s} TIMEOUT")
        signal.alarm(0)
        return
    finally:
        signal.alarm(0)
    print(f"{label:48s} {dt * 1e3:8.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    pt_raw = rng.integers(0, P, N).astype(np.int32)
    cam_raw = rng.integers(0, C, N).astype(np.int32)
    order = np.lexsort((cam_raw, pt_raw))  # make_problem's production row order
    pt_sorted, cam = pt_raw[order], cam_raw[order]
    pt_unsorted = pt_raw
    payload = rng.normal(size=(N, W)).astype(np.float32)

    d = jax.device_put
    pt_s, pt_u, pay = d(pt_sorted), d(pt_unsorted), d(payload)
    print(f"N={N} P={P} C={C} W={W} on {jax.devices()[0].platform}", flush=True)

    timed("a. segment_sum unsorted", lambda p, i: jax.ops.segment_sum(p, i, P), pay, pt_u)
    timed("b. segment_sum sorted, flag off", lambda p, i: jax.ops.segment_sum(p, i, P), pay, pt_s)
    timed(
        "c. segment_sum sorted, indices_are_sorted",
        lambda p, i: jax.ops.segment_sum(p, i, P, indices_are_sorted=True),
        pay,
        pt_s,
    )
    timed("d. at[].add scatter (sorted rows)", lambda p, i: jnp.zeros((P, W), jnp.float32).at[i].add(p), pay, pt_s)

    # Schur coupling tensor: (N, 27) payload into C*P slots
    pay27 = d(rng.normal(size=(N, 27)).astype(np.float32))
    seg_cam_major = d(cam.astype(np.int64) * P + pt_sorted)  # unsorted overall
    seg_pt_major = d(pt_sorted.astype(np.int64) * C + cam)  # nondecreasing (lexsort order)
    timed("e1. G seg-sum cam-major (unsorted)", lambda p, i: jax.ops.segment_sum(p, i, C * P), pay27, seg_cam_major)
    timed("e2. G seg-sum pt-major, flag off", lambda p, i: jax.ops.segment_sum(p, i, C * P), pay27, seg_pt_major)
    timed(
        "e3. G seg-sum pt-major, indices_are_sorted",
        lambda p, i: jax.ops.segment_sum(p, i, C * P, indices_are_sorted=True),
        pay27,
        seg_pt_major,
    )

    # one-hot matmul reference for the camera axis (tiny segment count)
    timed(
        "f. camera one-hot matmul (C=8)",
        lambda p, i: jax.nn.one_hot(i, C, dtype=p.dtype).T @ p,
        pay,
        d(cam.astype(np.int32)),
    )


if __name__ == "__main__":
    main()
