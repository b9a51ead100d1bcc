"""Cross-worker disk cache for expensive module-scoped fixtures.

Under pytest-xdist's worksteal scheduler, a module-scoped fixture
re-executes on EVERY worker that steals a test from its module — the
heavy solver fixtures (20-70 s bootstraps/optimizes) were being rebuilt
up to n_workers times per run. This helper publishes the first finished
result atomically to the shared per-run temp directory; later requests
load instantly. Concurrent first requests each compute rather than
idle-wait (a blocked worker is worse than a duplicated solve). The cache
key lives under the pytest base temp, so it is per-RUN — no staleness
across code changes.
"""

from __future__ import annotations

import os
import pickle


def per_run_cached(tmp_path_factory, key: str, compute):
    """Return compute(), memoized across xdist workers for this run.

    The cached value must be picklable and safe to share (treat it as
    immutable). `key` must be unique per fixture.
    """
    root = tmp_path_factory.getbasetemp()
    shared = root.parent if root.name.startswith("popen-") else root
    cache = shared / f"fixture_{key}.pkl"
    if cache.exists():
        try:
            with open(cache, "rb") as f:
                return pickle.load(f)
        except Exception:
            pass  # partial/corrupt write: recompute
    value = compute()
    tmp = cache.with_suffix(f".tmp{os.getpid()}")
    try:
        with open(tmp, "wb") as f:
            pickle.dump(value, f)
        tmp.replace(cache)
    except Exception:
        pass  # unpicklable or disk trouble: cache is best-effort
    return value
