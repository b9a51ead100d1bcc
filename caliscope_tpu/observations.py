"""Observation store: validated 2D/3D point tables as structure-of-arrays.

Parity: reference src/caliscope/core/point_data.py (ImagePoints:324,
WorldPoints:563, IMAGE_POINT_COLUMNS:256, WORLD_POINT_COLUMNS:268,
STATIC_SYNC_INDEX:18). CSV round trip is column-compatible with caliscope's
``xy_{TRACKER}.csv`` / world point CSVs so sessions interoperate directly.

TPU-first difference: the core storage is fixed-dtype numpy SoA (int32 keys +
float64 coords) rather than a pandas DataFrame; pandas is used only at the
CSV/interop boundary. Grouping operations (point indexing, per-point view
blocks) are computed once and handed to statically-shaped device kernels.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import numpy as np

STATIC_SYNC_INDEX = -1

IMAGE_POINT_COLUMNS = [
    "sync_index",
    "cam_id",
    "object_id",
    "keypoint_id",
    "img_loc_x",
    "img_loc_y",
    "obj_loc_x",
    "obj_loc_y",
    "obj_loc_z",
]

WORLD_POINT_COLUMNS = [
    "sync_index",
    "object_id",
    "keypoint_id",
    "x_coord",
    "y_coord",
    "z_coord",
    "frame_time",
]


def _as_int(a) -> np.ndarray:
    return np.asarray(a, dtype=np.int64).ravel()


def _as_f64(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float64)


@dataclass
class ImagePoints:
    """Long table of 2D observations keyed by (sync_index, cam_id, object_id,
    keypoint_id) with pixel coords and optional known object-frame coords."""

    sync_index: np.ndarray
    cam_id: np.ndarray
    object_id: np.ndarray
    keypoint_id: np.ndarray
    img_xy: np.ndarray  # (N,2) pixels
    obj_loc: np.ndarray = field(default=None)  # type: ignore[assignment]  # (N,3), NaN when unknown
    frame_time: Optional[np.ndarray] = None  # (N,), NaN allowed

    def __post_init__(self):
        self.sync_index = _as_int(self.sync_index)
        self.cam_id = _as_int(self.cam_id)
        self.object_id = _as_int(self.object_id)
        self.keypoint_id = _as_int(self.keypoint_id)
        self.img_xy = _as_f64(self.img_xy).reshape(-1, 2)
        n = len(self.sync_index)
        if self.obj_loc is None:
            self.obj_loc = np.full((n, 3), np.nan)
        else:
            self.obj_loc = _as_f64(self.obj_loc).reshape(-1, 3)
        if self.frame_time is not None:
            self.frame_time = _as_f64(self.frame_time).ravel()
        for name in ("cam_id", "object_id", "keypoint_id"):
            if len(getattr(self, name)) != n:
                raise ValueError(f"ImagePoints column {name} length mismatch")
        if len(self.img_xy) != n or len(self.obj_loc) != n:
            raise ValueError("ImagePoints coordinate length mismatch")
        if np.isnan(self.img_xy).any():
            raise ValueError("ImagePoints img_loc_x/y must not contain NaN")

    # ---- basics ------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.sync_index)

    @property
    def has_obj_loc(self) -> bool:
        return bool(len(self) and np.isfinite(self.obj_loc).all())

    @property
    def any_obj_loc(self) -> bool:
        return bool(len(self) and np.isfinite(self.obj_loc).any())

    def select(self, mask: np.ndarray) -> "ImagePoints":
        mask = np.asarray(mask)
        return ImagePoints(
            self.sync_index[mask],
            self.cam_id[mask],
            self.object_id[mask],
            self.keypoint_id[mask],
            self.img_xy[mask],
            self.obj_loc[mask],
            None if self.frame_time is None else self.frame_time[mask],
        )

    @classmethod
    def empty(cls) -> "ImagePoints":
        return cls(np.zeros(0), np.zeros(0), np.zeros(0), np.zeros(0), np.zeros((0, 2)))

    @classmethod
    def concat(cls, parts: list["ImagePoints"]) -> "ImagePoints":
        parts = [p for p in parts if len(p)]
        if not parts:
            return cls.empty()
        ft = None
        if all(p.frame_time is not None for p in parts):
            ft = np.concatenate([p.frame_time for p in parts])
        return cls(
            np.concatenate([p.sync_index for p in parts]),
            np.concatenate([p.cam_id for p in parts]),
            np.concatenate([p.object_id for p in parts]),
            np.concatenate([p.keypoint_id for p in parts]),
            np.concatenate([p.img_xy for p in parts]),
            np.concatenate([p.obj_loc for p in parts]),
            ft,
        )

    # ---- keys & grouping ---------------------------------------------------
    def point_index(self, static_object_ids: frozenset[int] = frozenset()):
        """Assign each observation a dense 3D-point index.

        Point identity = (sync_index, object_id, keypoint_id), except that
        observations of static objects collapse sync -> STATIC_SYNC_INDEX
        (one world point per (object, keypoint) across all frames); matches
        reference point_data.py:461-543.

        Returns (pt_idx (N,), keys (M,3) [sync, obj, kp]).
        """
        sync = self.sync_index.copy()
        if static_object_ids:
            static = np.isin(self.object_id, list(static_object_ids))
            sync[static] = STATIC_SYNC_INDEX
        keys = np.stack([sync, self.object_id, self.keypoint_id], axis=1)
        uniq, inverse = np.unique(keys, axis=0, return_inverse=True)
        return inverse.astype(np.int64), uniq

    def duplicate_key_count(self) -> int:
        keys = np.stack([self.sync_index, self.cam_id, self.object_id, self.keypoint_id], axis=1)
        uniq = np.unique(keys, axis=0)
        return len(keys) - len(uniq)

    # ---- triangulation -----------------------------------------------------
    def triangulate(
        self,
        camera_array,
        static_object_ids: frozenset[int] = frozenset(),
        min_views: int = 2,
    ) -> "WorldPoints":
        """Undistort to normalized coords, then batched-DLT triangulate every
        (sync, object, keypoint) group seen by >= min_views posed cameras."""
        import jax.numpy as jnp

        from caliscope_tpu.ops.bucket import bucket_size, pad_rows
        from caliscope_tpu.ops.projection import undistort_points
        from caliscope_tpu.ops.triangulate import triangulate_groups

        views = camera_array.device_views(posed_only=True)
        if len(self) == 0 or len(views.cam_ids) == 0:
            return WorldPoints.empty()

        id_to_idx = {int(cid): i for i, cid in enumerate(views.cam_ids)}
        valid = np.isin(self.cam_id, views.cam_ids)
        obs = self.select(valid)
        if len(obs) == 0:
            return WorldPoints.empty()
        cam_idx = np.array([id_to_idx[int(c)] for c in obs.cam_id], dtype=np.int64)

        # Batched per-observation undistortion: gather each obs's K/dist, one
        # fused elementwise kernel — no per-camera grouping needed on TPU.
        # Mixed brown/fisheye arrays are handled by running both branches and
        # selecting (both are cheap elementwise iterate kernels).
        # Every data-dependent extent (rows, points, view width) is bucketed
        # to a power of two so this method — called once per pipeline stage
        # and per scaffold-growth step — reuses compiled programs instead of
        # retracing at each dataset's exact sizes.
        K_obs = views.K[cam_idx]
        d_obs = views.dist[cam_idx]
        fe_obs = views.fisheye[cam_idx]
        N = len(obs)
        Nb = bucket_size(N)
        uv_b = pad_rows(obs.img_xy, Nb)
        K_b = pad_rows(K_obs, Nb)
        K_b[N:] = np.eye(3)
        d_b = pad_rows(d_obs, Nb)
        xn_brown = undistort_points(jnp.asarray(uv_b), jnp.asarray(K_b), jnp.asarray(d_b), False)
        if fe_obs.any():
            xn_fish = undistort_points(jnp.asarray(uv_b), jnp.asarray(K_b), jnp.asarray(d_b[:, :4]), True)
            xn = np.where(fe_obs[:, None], np.asarray(xn_fish)[:N], np.asarray(xn_brown)[:N])
        else:
            xn = np.asarray(xn_brown)[:N]

        pt_idx, keys = obs.point_index(static_object_ids)
        n_points = len(keys)
        counts = np.bincount(pt_idx, minlength=n_points)
        max_views = int(counts.max())
        # Static groups can aggregate cams x syncs observations; cap padding.
        max_views = min(max_views, 512)
        Pb = bucket_size(n_points + 1)
        xyz, n_views = triangulate_groups(
            jnp.asarray(views.proj),
            jnp.asarray(pad_rows(cam_idx, Nb)),
            jnp.asarray(pad_rows(xn, Nb)),
            jnp.asarray(pad_rows(pt_idx, Nb, fill=Pb - 1)),
            Pb,
            bucket_size(max_views, floor=2),
        )
        xyz = np.asarray(xyz)[:n_points]
        n_views = np.asarray(n_views)[:n_points]
        keep = n_views >= min_views

        ft = np.full(n_points, np.nan)
        if obs.frame_time is not None:
            sums = np.zeros(n_points)
            cnts = np.zeros(n_points)
            good = np.isfinite(obs.frame_time)
            np.add.at(sums, pt_idx[good], obs.frame_time[good])
            np.add.at(cnts, pt_idx[good], 1.0)
            with np.errstate(invalid="ignore", divide="ignore"):
                ft = sums / cnts
        ft[keys[:, 0] == STATIC_SYNC_INDEX] = np.nan

        return WorldPoints(
            sync_index=keys[keep, 0],
            object_id=keys[keep, 1],
            keypoint_id=keys[keep, 2],
            xyz=xyz[keep],
            frame_time=ft[keep],
        )

    # ---- gap filling -------------------------------------------------------
    def fill_gaps(self, max_gap: int = 3) -> "ImagePoints":
        """Linearly interpolate missing sync indices within each
        (cam, object, keypoint) track when the gap is <= max_gap frames
        (reference point_data.py:375-414)."""
        if len(self) == 0 or max_gap <= 0:
            return self
        new_parts = [self]
        track_keys = np.stack([self.cam_id, self.object_id, self.keypoint_id], axis=1)
        uniq, inv = np.unique(track_keys, axis=0, return_inverse=True)
        for t in range(len(uniq)):
            sel = inv == t
            sync = self.sync_index[sel]
            order = np.argsort(sync)
            sync = sync[order]
            xy = self.img_xy[sel][order]
            if len(sync) < 2:
                continue
            gaps = np.diff(sync)
            fill_at = np.where((gaps > 1) & (gaps <= max_gap + 1))[0]
            if len(fill_at) == 0:
                continue
            s_list, xy_list = [], []
            for i in fill_at:
                missing = np.arange(sync[i] + 1, sync[i + 1])
                frac = (missing - sync[i]) / (sync[i + 1] - sync[i])
                s_list.append(missing)
                xy_list.append(xy[i] + frac[:, None] * (xy[i + 1] - xy[i]))
            s_new = np.concatenate(s_list)
            n_new = len(s_new)
            cam, obj, kp = uniq[t]
            obj_loc_track = self.obj_loc[sel][order]
            # obj_loc is constant along a track when present
            ol = np.broadcast_to(obj_loc_track[0], (n_new, 3)).copy() if np.isfinite(obj_loc_track[0]).all() else None
            new_parts.append(
                ImagePoints(
                    s_new,
                    np.full(n_new, cam),
                    np.full(n_new, obj),
                    np.full(n_new, kp),
                    np.concatenate(xy_list),
                    ol,
                )
            )
        out = ImagePoints.concat(new_parts)
        order = np.lexsort((out.keypoint_id, out.object_id, out.cam_id, out.sync_index))
        return out.select(order)

    # ---- interop -----------------------------------------------------------
    def to_dataframe(self):
        import pandas as pd

        df = pd.DataFrame(
            {
                "sync_index": self.sync_index,
                "cam_id": self.cam_id,
                "object_id": self.object_id,
                "keypoint_id": self.keypoint_id,
                "img_loc_x": self.img_xy[:, 0],
                "img_loc_y": self.img_xy[:, 1],
                "obj_loc_x": self.obj_loc[:, 0],
                "obj_loc_y": self.obj_loc[:, 1],
                "obj_loc_z": self.obj_loc[:, 2],
            }
        )
        if self.frame_time is not None:
            df["frame_time"] = self.frame_time
        return df

    @classmethod
    def from_dataframe(cls, df) -> "ImagePoints":
        missing = [c for c in IMAGE_POINT_COLUMNS[:6] if c not in df.columns]
        if missing:
            raise ValueError(f"ImagePoints missing required columns: {missing}")
        obj_loc = None
        if all(c in df.columns for c in ("obj_loc_x", "obj_loc_y")):
            # legacy flat-board CSVs (e.g. the project's committed
            # 4_cam_recording xy.csv) omit obj_loc_z entirely or leave it
            # empty: planar implies z=0 (the reference applies the same
            # assumption, capture_volume.py:905)
            z = df["obj_loc_z"] if "obj_loc_z" in df.columns else np.full(len(df), np.nan)
            obj_loc = np.column_stack([df["obj_loc_x"], df["obj_loc_y"], z])
            xy_ok = np.isfinite(obj_loc[:, :2]).all(axis=1)
            z_nan = ~np.isfinite(obj_loc[:, 2])
            if z_nan[xy_ok].all() and xy_ok.any():
                obj_loc[xy_ok & z_nan, 2] = 0.0
        ft = df["frame_time"].to_numpy() if "frame_time" in df.columns else None
        return cls(
            df["sync_index"].to_numpy(),
            df["cam_id"].to_numpy(),
            df["object_id"].to_numpy(),
            df["keypoint_id"].to_numpy(),
            np.column_stack([df["img_loc_x"], df["img_loc_y"]]),
            obj_loc,
            ft,
        )

    @classmethod
    def from_csv(cls, path: Path | str) -> "ImagePoints":
        import pandas as pd

        return cls.from_dataframe(pd.read_csv(path))

    def to_csv(self, path: Path | str) -> None:
        from caliscope_tpu.persistence import safe_write_text

        safe_write_text(self.to_dataframe().to_csv(index=False), Path(path))


@dataclass
class WorldPoints:
    """Triangulated 3D points keyed by (sync_index, object_id, keypoint_id)."""

    sync_index: np.ndarray
    object_id: np.ndarray
    keypoint_id: np.ndarray
    xyz: np.ndarray  # (N,3)
    frame_time: Optional[np.ndarray] = None

    def __post_init__(self):
        self.sync_index = _as_int(self.sync_index)
        self.object_id = _as_int(self.object_id)
        self.keypoint_id = _as_int(self.keypoint_id)
        self.xyz = _as_f64(self.xyz).reshape(-1, 3)
        if self.frame_time is None:
            self.frame_time = np.full(len(self.sync_index), np.nan)
        else:
            self.frame_time = _as_f64(self.frame_time).ravel()

    def __len__(self) -> int:
        return len(self.sync_index)

    @classmethod
    def empty(cls) -> "WorldPoints":
        return cls(np.zeros(0), np.zeros(0), np.zeros(0), np.zeros((0, 3)))

    def select(self, mask) -> "WorldPoints":
        mask = np.asarray(mask)
        return WorldPoints(
            self.sync_index[mask],
            self.object_id[mask],
            self.keypoint_id[mask],
            self.xyz[mask],
            self.frame_time[mask],
        )

    def keys(self) -> np.ndarray:
        return np.stack([self.sync_index, self.object_id, self.keypoint_id], axis=1)

    def with_xyz(self, xyz: np.ndarray) -> "WorldPoints":
        return WorldPoints(self.sync_index, self.object_id, self.keypoint_id, xyz, self.frame_time)

    # ---- gap filling + smoothing ------------------------------------------
    def fill_gaps(self, max_gap: int = 3) -> "WorldPoints":
        """Linear interpolation of missing sync indices per (obj, kp) track."""
        if len(self) == 0 or max_gap <= 0:
            return self
        parts = [self]
        track_keys = np.stack([self.object_id, self.keypoint_id], axis=1)
        uniq, inv = np.unique(track_keys, axis=0, return_inverse=True)
        for t in range(len(uniq)):
            sel = (inv == t) & (self.sync_index != STATIC_SYNC_INDEX)
            sync = self.sync_index[sel]
            order = np.argsort(sync)
            sync = sync[order]
            if len(sync) < 2:
                continue
            xyz = self.xyz[sel][order]
            ft = self.frame_time[sel][order]
            gaps = np.diff(sync)
            fill_at = np.where((gaps > 1) & (gaps <= max_gap + 1))[0]
            if len(fill_at) == 0:
                continue
            s_list, xyz_list, ft_list = [], [], []
            for i in fill_at:
                missing = np.arange(sync[i] + 1, sync[i + 1])
                frac = (missing - sync[i]) / (sync[i + 1] - sync[i])
                s_list.append(missing)
                xyz_list.append(xyz[i] + frac[:, None] * (xyz[i + 1] - xyz[i]))
                ft_list.append(ft[i] + frac * (ft[i + 1] - ft[i]))
            s_new = np.concatenate(s_list)
            obj, kp = uniq[t]
            parts.append(
                WorldPoints(
                    s_new,
                    np.full(len(s_new), obj),
                    np.full(len(s_new), kp),
                    np.concatenate(xyz_list),
                    np.concatenate(ft_list),
                )
            )
        out_parts = [p for p in parts if len(p)]
        out = WorldPoints(
            np.concatenate([p.sync_index for p in out_parts]),
            np.concatenate([p.object_id for p in out_parts]),
            np.concatenate([p.keypoint_id for p in out_parts]),
            np.concatenate([p.xyz for p in out_parts]),
            np.concatenate([p.frame_time for p in out_parts]),
        )
        order = np.lexsort((out.keypoint_id, out.object_id, out.sync_index))
        return out.select(order)

    def smooth(self, fps: float, cutoff_hz: float = 6.0, order: int = 2) -> "WorldPoints":
        """Zero-phase Butterworth low-pass per (obj, kp) track — JAX filtfilt
        (reference point_data.py:636-676 uses scipy butter/filtfilt)."""
        from caliscope_tpu.ops.signal import butter_lowpass, filtfilt

        if len(self) == 0:
            return self
        b, a = butter_lowpass(cutoff_hz, fps, order)
        xyz = self.xyz.copy()
        track_keys = np.stack([self.object_id, self.keypoint_id], axis=1)
        uniq, inv = np.unique(track_keys, axis=0, return_inverse=True)
        for t in range(len(uniq)):
            sel = np.where((inv == t) & (self.sync_index != STATIC_SYNC_INDEX))[0]
            if len(sel) <= 3 * max(len(a), len(b)):
                continue
            order_idx = sel[np.argsort(self.sync_index[sel])]
            xyz[order_idx] = np.asarray(filtfilt(b, a, self.xyz[order_idx], axis=0))
        return self.with_xyz(xyz)

    # ---- interop -----------------------------------------------------------
    def to_dataframe(self):
        import pandas as pd

        return pd.DataFrame(
            {
                "sync_index": self.sync_index,
                "object_id": self.object_id,
                "keypoint_id": self.keypoint_id,
                "x_coord": self.xyz[:, 0],
                "y_coord": self.xyz[:, 1],
                "z_coord": self.xyz[:, 2],
                "frame_time": self.frame_time,
            }
        )

    @classmethod
    def from_dataframe(cls, df) -> "WorldPoints":
        ft = df["frame_time"].to_numpy() if "frame_time" in df.columns else None
        return cls(
            df["sync_index"].to_numpy(),
            df["object_id"].to_numpy(),
            df["keypoint_id"].to_numpy(),
            np.column_stack([df["x_coord"], df["y_coord"], df["z_coord"]]),
            ft,
        )

    @classmethod
    def from_csv(cls, path: Path | str) -> "WorldPoints":
        import pandas as pd

        return cls.from_dataframe(pd.read_csv(path))

    def to_csv(self, path: Path | str) -> None:
        from caliscope_tpu.persistence import safe_write_text

        safe_write_text(self.to_dataframe().to_csv(index=False), Path(path))
