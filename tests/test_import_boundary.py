"""Import-boundary canaries (reference tests/test_import_boundary.py:35).

The headless core must import without the GUI stack, and — stricter than the
reference — without initializing the JAX device backend or dragging in heavy
optional host deps. The backend rule is load-bearing here: the tunneled TPU
plugin can wedge for hours, and a library whose *import* touches the backend
would hang every caller, including ones that only wanted to read a TOML.

Each canary runs in a subprocess so this test file's own imports cannot
contaminate the measurement.
"""

from __future__ import annotations

import subprocess
import sys

import pytest


def _run_canary(code: str) -> None:
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=240
    )
    assert out.returncode == 0, f"canary failed:\nstdout={out.stdout}\nstderr={out.stderr}"


def test_package_import_stays_headless():
    _run_canary(
        "import sys; import caliscope_tpu;\n"
        "bad = [m for m in sys.modules if 'caliscope_tpu.gui' in m or m.startswith('PySide')]\n"
        "assert not bad, f'import caliscope_tpu pulled GUI modules: {bad}'\n"
    )


def test_package_import_does_not_initialize_jax_backend():
    _run_canary(
        "import caliscope_tpu\n"
        "import jax\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, 'importing caliscope_tpu initialized a JAX backend'\n"
    )


def test_package_import_avoids_heavy_optional_deps():
    _run_canary(
        "import sys; import caliscope_tpu\n"
        "roots = {m.split('.')[0] for m in sys.modules}\n"
        "heavy = roots & {'cv2', 'pandas', 'scipy', 'torch', 'onnxruntime'}\n"
        "assert not heavy, f'import caliscope_tpu pulled heavy deps: {heavy}'\n"
    )


@pytest.mark.parametrize(
    "module",
    [
        "caliscope_tpu.volume",
        "caliscope_tpu.observations",
        "caliscope_tpu.pipelines.calibrate_extrinsics",
        "caliscope_tpu.pipelines.calibrate_intrinsics",
        "caliscope_tpu.workspace",
        "caliscope_tpu.api",
        "caliscope_tpu.presenters",
        "caliscope_tpu.reporting",
    ],
)
def test_core_module_imports_without_gui(module):
    _run_canary(
        # poison PySide6 so even an installed GUI toolkit cannot satisfy a
        # stray core-side import of it
        "import sys; sys.modules['PySide6'] = None\n"
        f"import importlib; importlib.import_module('{module}')\n"
    )
