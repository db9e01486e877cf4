"""Pose interpolation for camera sweeps (host-side, numpy/scipy).

Behavioral reference: src/util/cam_geometry.py:126-205 (Slerp/TransSlerp) in
malteprinzler/diner. Rotations interpolate with scipy spherical slerp; locations
interpolate piecewise-linearly with clamped extrapolation. This runs on the
host to build sweep extrinsics; it is not on the jit path.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation, Slerp as _RotSlerp


class PoseSlerp:
    """Interpolate (rotation, location) keyframes over scalar times."""

    def __init__(self, times, rotations: Rotation, locations):
        times = np.asarray(times, dtype=np.float64)
        locations = np.asarray(locations, dtype=np.float64)
        order = np.argsort(times)
        self._times = times[order]
        self._locations = locations[order]
        self._rotslerp = _RotSlerp(self._times, rotations[order])

    def __call__(self, query_times):
        q = np.clip(np.atleast_1d(np.asarray(query_times, dtype=np.float64)),
                    self._times.min(), self._times.max())
        rotations = self._rotslerp(q)
        idx = np.clip(np.searchsorted(self._times, q, side="right") - 1,
                      0, len(self._times) - 2)
        t0, t1 = self._times[idx], self._times[idx + 1]
        w1 = np.clip((q - t0) / np.maximum(t1 - t0, 1e-4), 0.0, 1.0)
        locations = (1 - w1[:, None]) * self._locations[idx] + w1[:, None] * self._locations[idx + 1]
        return rotations, locations

    def extrinsics(self, query_times):
        """Interpolated world->cam 4x4 matrices, (N, 4, 4) float32."""
        rotations, locations = self(query_times)
        n = len(locations)
        out = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        out[:, :3, :3] = rotations.as_matrix().astype(np.float32)
        out[:, :3, 3] = locations.astype(np.float32)
        return out
