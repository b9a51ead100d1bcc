"""Export formats: wide labelled CSV, OpenSim TRC, Blender scene.

Parity: reference src/caliscope/export/ (trc_export.py:12,44,
blender_scene.py:316) plus CameraArray.to_aniposelib_toml (cameras.py).
"""

from caliscope_tpu.export.trc import xyz_to_trc, xyz_to_wide_labelled  # noqa: F401
from caliscope_tpu.export.blender import write_blender_scene  # noqa: F401
