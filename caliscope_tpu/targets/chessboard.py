"""Plain chessboard calibration target.

Parity: reference src/caliscope/core/chessboard.py (Chessboard:8). Identity
scheme: object_id=0, keypoint_id = inner-corner index (row-major, x fastest),
matching the ChArUco inner-corner layout so the two board types share
constraint compilation and solvers.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np


@dataclass(frozen=True)
class Chessboard:
    """rows x columns SQUARES (inner corners are (rows-1) x (columns-1))."""

    rows: int
    columns: int
    square_size_m: float | None = None

    def __post_init__(self):
        if self.rows < 2 or self.columns < 2:
            raise ValueError("Chessboard needs at least 2x2 squares")
        if self.square_size_m is not None and self.square_size_m <= 0:
            raise ValueError(f"square_size_m must be positive, got {self.square_size_m}")

    @property
    def inner_rows(self) -> int:
        return self.rows - 1

    @property
    def inner_columns(self) -> int:
        return self.columns - 1

    @property
    def n_corners(self) -> int:
        return self.inner_rows * self.inner_columns

    def object_points(self) -> np.ndarray:
        """(N, 3) inner-corner coordinates; unit spacing when square size is
        unknown (intrinsics-only use), meters when set."""
        s = self.square_size_m if self.square_size_m is not None else 1.0
        cols, rows = self.inner_columns, self.inner_rows
        xs, ys = np.meshgrid(np.arange(1, cols + 1), np.arange(1, rows + 1))
        pts = np.zeros((rows * cols, 3))
        pts[:, 0] = xs.ravel() * s
        pts[:, 1] = ys.ravel() * s
        return pts

    def connectivity(self) -> list[tuple[int, int]]:
        """Grid-neighbor edges for wireframe overlays."""
        cols = self.inner_columns
        edges = []
        for k in range(self.n_corners):
            c, r = k % cols, k // cols
            if c + 1 < cols:
                edges.append((k, k + 1))
            if r + 1 < self.inner_rows:
                edges.append((k, k + cols))
        return edges

    def to_toml(self, path: Path | str) -> None:
        from caliscope_tpu import persistence

        data = {"type": "chessboard", "rows": self.rows, "columns": self.columns}
        if self.square_size_m is not None:
            data["square_size_m"] = self.square_size_m
        persistence.safe_write_toml(data, path)

    @classmethod
    def from_toml(cls, path: Path | str) -> "Chessboard":
        from caliscope_tpu import persistence

        d = persistence.load_toml(path)
        return cls(rows=int(d["rows"]), columns=int(d["columns"]), square_size_m=d.get("square_size_m"))
