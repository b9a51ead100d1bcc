from caliscope_tpu.gui.view_models.playback_view_model import (  # noqa: F401
    FrameGeometry,
    PlaybackViewModel,
)
