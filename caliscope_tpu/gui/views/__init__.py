from caliscope_tpu.gui.views.cameras_tab import CamerasTabWidget
from caliscope_tpu.gui.views.extract_view import ExtractView
from caliscope_tpu.gui.views.extrinsic_view import ExtrinsicCalibrationView
from caliscope_tpu.gui.views.intrinsic_view import IntrinsicCalibrationView
from caliscope_tpu.gui.views.project_view import ProjectSetupView
from caliscope_tpu.gui.views.reconstruct_view import ReconstructionView

__all__ = [
    "CamerasTabWidget",
    "ExtractView",
    "ExtrinsicCalibrationView",
    "IntrinsicCalibrationView",
    "ProjectSetupView",
    "ReconstructionView",
]
