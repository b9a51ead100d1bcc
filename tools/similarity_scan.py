"""Normalized-line similarity scan vs the reference (originality audit).

Reports, per (repo file, reference counterpart) pair, the fraction of
substantive repo lines (>= 25 chars after whitespace normalization)
appearing verbatim in the reference. Round-1 review flagged two files as
substantially copied; the round-2 rewrites must stay under 20% (the
residue is structural: imports, dataclass field lists, one-line idioms).

Run: python tools/similarity_scan.py
"""
import re, sys
from pathlib import Path

def norm_lines(p):
    out = []
    for line in Path(p).read_text().splitlines():
        s = re.sub(r"\s+", " ", line.strip())
        if len(s) >= 25:
            out.append(s)
    return out

pairs = [
    ("caliscope_tpu/pipelines/calibrate_extrinsics.py", "/root/reference/src/caliscope/core/calibrate_extrinsics.py"),
    ("caliscope_tpu/volume.py", "/root/reference/src/caliscope/core/capture_volume.py"),
    ("caliscope_tpu/gui/main_window.py", "/root/reference/src/caliscope/gui/main_widget.py"),
    ("caliscope_tpu/synthetic/explorer.py", "/root/reference/src/caliscope/synthetic/explorer/presenter.py"),
    ("caliscope_tpu/gui/views/extrinsic_view.py", "/root/reference/src/caliscope/gui/views/extrinsic_calibration_view.py"),
    ("caliscope_tpu/pose/onnx_tracker.py", "/root/reference/src/caliscope/trackers/onnx_tracker.py"),
    ("caliscope_tpu/media/streamer.py", "/root/reference/src/caliscope/recording/frame_packet_streamer.py"),
    # round-4 GUI back half (API-parity widgets — the highest structural-similarity risk)
    ("caliscope_tpu/gui/widgets/camera_list.py", "/root/reference/src/caliscope/gui/camera_list_widget.py"),
    ("caliscope_tpu/gui/views/cameras_tab.py", "/root/reference/src/caliscope/gui/cameras_tab_widget.py"),
    ("caliscope_tpu/gui/theme.py", "/root/reference/src/caliscope/gui/theme.py"),
    ("caliscope_tpu/gui/view_models/playback_view_model.py", "/root/reference/src/caliscope/gui/view_models/playback_view_model.py"),
    ("caliscope_tpu/gui/frame_render.py", "/root/reference/src/caliscope/gui/views/intrinsic_calibration_widget.py"),
    ("caliscope_tpu/gui/gc_confinement.py", "/root/reference/src/caliscope/gui/gc_confinement.py"),
    ("caliscope_tpu/gui/frame_tools.py", "/root/reference/src/caliscope/gui/frame_emitters/tools.py"),
    ("caliscope_tpu/gui/widgets/link_label.py", "/root/reference/src/caliscope/gui/widgets/link_label.py"),
    ("caliscope_tpu/gui/widgets/cameras_placeholder.py", "/root/reference/src/caliscope/gui/widgets/cameras_info_placeholder.py"),
]
for ours, ref in pairs:
    a = norm_lines(ours)
    b = set(norm_lines(ref))
    hit = sum(1 for s in a if s in b)
    print(f"{ours}: {hit}/{len(a)} = {100*hit/max(len(a),1):.1f}% verbatim overlap")
