"""Wide labelled CSV + OpenSim TRC export.

Parity: reference src/caliscope/export/trc_export.py (xyz_to_wide_labelled:12,
xyz_to_trc:44). File format matches the reference byte-structure (tab-separated
TRC with the standard 4-line header) so OpenSim/Pose2Sim tooling reads both.
"""

from __future__ import annotations

import csv
import logging
from pathlib import Path

import numpy as np

from caliscope_tpu.observations import WorldPoints

logger = logging.getLogger(__name__)


def xyz_to_wide_labelled(world_points: WorldPoints, tracker):
    """Long xyz -> wide per-sync table with {point_name}_{x,y,z} columns.

    Single-object assumption (object_id dropped), matching the reference.
    """
    import pandas as pd

    df = world_points.to_dataframe().rename(columns={"x_coord": "x", "y_coord": "y", "z_coord": "z"})
    df = df[["sync_index", "keypoint_id", "x", "y", "z"]]
    df["point_name"] = df["keypoint_id"].map(tracker.get_point_name)
    wide = df.pivot_table(index=["sync_index"], columns="point_name", values=["x", "y", "z"])
    wide.columns = ["{}_{}".format(y, x) for x, y in wide.columns]
    wide = wide.reset_index().groupby("sync_index").agg("first")
    return wide.sort_index(axis=1, ascending=True)


def xyz_to_trc(world_points: WorldPoints, tracker, target_path: Path) -> Path:
    """Write an OpenSim .trc next to target_path (stem reused)."""
    labelled = xyz_to_wide_labelled(world_points, tracker)

    df = world_points.to_dataframe()
    sync_time = df.groupby("sync_index")["frame_time"].mean()
    if sync_time.isna().all():
        # no capture timestamps: synthesize 30 fps
        sync_time = sync_time.index.to_series() / 30.0
    sync_time = (sync_time - sync_time.min()).round(3)
    labelled = labelled.copy()
    labelled.insert(0, "Time", sync_time)
    labelled = labelled.reset_index().rename(columns={"sync_index": "Frame"})
    labelled.sort_values(by="Time", inplace=True)

    diffs = labelled["Time"].diff().dropna()
    rates = 1.0 / diffs[diffs > 0]
    mean_rate = float(rates.mean()) if len(rates) else 30.0

    cols_to_sort = sorted(c for c in labelled.columns if c not in ("Frame", "Time") and not c.startswith("face"))
    labelled = labelled[["Frame", "Time"] + cols_to_sort]
    labelled["Frame"] = labelled["Frame"].astype(int)

    tracked_points = sorted({c.rsplit("_", 1)[0] for c in cols_to_sort if c.endswith(("_x", "_y", "_z"))})
    num_frames = len(labelled) - 1

    trc_path = Path(target_path.parent, f"{Path(target_path).stem}.trc")
    with open(trc_path, "wt", newline="", encoding="utf-8") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["PathFileType", "4", "(X/Y/Z)", str(trc_path)])
        w.writerow(
            ["DataRate", "CameraRate", "NumFrames", "NumMarkers", "Units",
             "OrigDataRate", "OrigDataStartFrame", "OrigNumFrames"]
        )
        w.writerow(
            [int(mean_rate), int(mean_rate), num_frames, len(tracked_points), "m",
             int(mean_rate), 0, num_frames]
        )
        header = ["Frame#", "Time"]
        for name in tracked_points:
            header += [name, "", ""]
        w.writerow(header)
        axis_row = ["", ""]
        for i in range(len(tracked_points)):
            axis_row += [f"X{i + 1}", f"Y{i + 1}", f"Z{i + 1}"]
        w.writerow(axis_row)
        w.writerow([])
        for _, row in labelled.iterrows():
            out = [int(row["Frame"]), row["Time"]]
            for name in tracked_points:
                for ax in ("x", "y", "z"):
                    v = row.get(f"{name}_{ax}", np.nan)
                    out.append("" if np.isnan(v) else round(float(v), 6))
            w.writerow(out)
    logger.info(f"Wrote TRC with {len(tracked_points)} markers, {num_frames} frames -> {trc_path}")
    return trc_path
