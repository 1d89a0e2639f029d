"""Scalar -> color mapping for point attribute shading.

Rebuild of /root/reference/ml3d/vis/colormap.py, vectorized with numpy
instead of per-point python loops.
"""

import numpy as np


class Colormap:
    """Piecewise-linear colormap over [0, 1]."""

    class Point:

        def __init__(self, value, color):
            assert 0.0 <= value <= 1.0
            self.value = value
            self.color = color

        def __repr__(self):
            return f"Colormap.Point({self.value}, {self.color})"

    def __init__(self, points):
        self.points = points

    def calc_u_array(self, values, range_min, range_max):
        """Normalize values into [0, 1] over the given range."""
        values = np.asarray(values, np.float64)
        width = max(range_max - range_min, 1e-12)
        return np.clip((values - range_min) / width, 0.0, 1.0)

    def calc_color_array(self, values, range_min, range_max):
        """Per-value RGB colors [N, 3] by linear interpolation."""
        u = self.calc_u_array(values, range_min, range_max)
        xp = np.array([p.value for p in self.points])
        fp = np.array([p.color for p in self.points])  # [P, 3]
        out = np.stack(
            [np.interp(u, xp, fp[:, c]) for c in range(3)], axis=-1)
        return out

    @staticmethod
    def make_greyscale():
        """Greyscale colormap (reference colormap.py:78-84)."""
        return Colormap([
            Colormap.Point(0.0, [0.0, 0.0, 0.0]),
            Colormap.Point(1.0, [1.0, 1.0, 1.0]),
        ])

    @staticmethod
    def make_rainbow():
        """Rainbow colormap (reference colormap.py:86-96)."""
        return Colormap([
            Colormap.Point(0.000, [0.0, 0.0, 1.0]),
            Colormap.Point(0.125, [0.0, 0.5, 1.0]),
            Colormap.Point(0.250, [0.0, 1.0, 1.0]),
            Colormap.Point(0.375, [0.0, 1.0, 0.5]),
            Colormap.Point(0.500, [0.0, 1.0, 0.0]),
            Colormap.Point(0.625, [0.5, 1.0, 0.0]),
            Colormap.Point(0.750, [1.0, 1.0, 0.0]),
            Colormap.Point(0.875, [1.0, 0.5, 0.0]),
            Colormap.Point(1.000, [1.0, 0.0, 0.0]),
        ])
