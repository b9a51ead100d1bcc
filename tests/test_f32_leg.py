"""f32 CPU leg: the production TPU dtype's numerics, without the chip.

The suite pins jax to x64 CPU (conftest), so the float32 behaviors the
TPU actually runs — the DLT Gauss-Newton polish, the matmul-precision
import default, the f32 LM solve in both observation layouts — were only
exercised by the rarely-run on-device tier. This test runs them in a
clean subprocess with x64 disabled (flipping the global x64 flag
mid-suite would poison jit caches shared by the xdist worker).
See tests/_f32_leg_script.py for the assertions and their calibration.
"""

import os
import subprocess
import sys
from pathlib import Path


def test_f32_numerics_leg():
    script = Path(__file__).parent / "_f32_leg_script.py"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_ENABLE_X64", "JAX_PLATFORMS", "CALISCOPE_TPU_TEST_PLATFORM")
    }
    env["JAX_PLATFORMS"] = "cpu"
    # reuse a persistent cache keyed separately from the x64 suite's
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/caliscope_jax_cache_f32leg")
    out = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True, timeout=900, env=env,
        cwd=str(Path(__file__).parent.parent),
    )
    assert out.returncode == 0, f"f32 leg failed:\nstdout:\n{out.stdout}\nstderr:\n{out.stderr[-3000:]}"
    assert "F32LEG_OK" in out.stdout
