"""Media I/O + temporal synchronization (L1).

Parity: reference src/caliscope/recording/ (frame_source.py,
synchronized_timestamps.py, frame_timestamps.py, video_utils.py,
overlay_video_writer.py). Decode stays host-side (the reference uses
PyAV/FFmpeg; here OpenCV's FFmpeg-backed VideoCapture) feeding device
pipelines; the sync algorithm is pure logic.
"""

from caliscope_tpu.media.frame_timestamps import FrameTimestamps  # noqa: F401
from caliscope_tpu.media.synchronized_timestamps import SynchronizedTimestamps  # noqa: F401
from caliscope_tpu.media.video import FrameSource, read_video_properties, VideoProperties  # noqa: F401
