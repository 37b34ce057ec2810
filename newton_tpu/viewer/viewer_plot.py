"""Matplotlib offline viewer: renders frames to PNG image sequences.

Fills the role of the reference's GL viewer in headless environments
(reference viewers needing OpenGL/pyglet are unavailable here): body frames
and particles as 3D scatter, camera-sensor images straight to files.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .viewer import ViewerBase

__all__ = ["ViewerPlot"]


class ViewerPlot(ViewerBase):
    def __init__(self, out_dir: str = "frames", every: int = 1,
                 elev: float = 20.0, azim: float = -60.0,
                 bounds: float = 2.0):
        super().__init__()
        try:
            import matplotlib
            matplotlib.use("Agg")
        except ImportError as e:
            raise ImportError("ViewerPlot requires matplotlib") from e
        self.out_dir = out_dir
        self.every = int(every)
        self.elev, self.azim = elev, azim
        self.bounds = bounds
        os.makedirs(out_dir, exist_ok=True)

    def log_state(self, state):
        if self._frame % self.every:
            return
        import matplotlib.pyplot as plt
        fig = plt.figure(figsize=(5, 5))
        ax = fig.add_subplot(projection="3d")
        bq = np.asarray(state.body_q)
        if len(bq):
            ax.scatter(bq[:, 0], bq[:, 1], bq[:, 2], c="tab:blue", s=40)
        if state.particle_count:
            pq = np.asarray(state.particle_q)
            ax.scatter(pq[:, 0], pq[:, 1], pq[:, 2], c="tab:orange", s=4)
        b = self.bounds
        ax.set_xlim(-b, b); ax.set_ylim(-b, b); ax.set_zlim(0, 2 * b)
        ax.view_init(self.elev, self.azim)
        ax.set_title(f"t = {self.time:.3f}s")
        fig.savefig(os.path.join(self.out_dir, f"frame_{self._frame:05d}.png"),
                    dpi=80)
        plt.close(fig)

    def log_image(self, name, image):
        import matplotlib.pyplot as plt
        img = np.asarray(image)
        safe = name.replace("/", "_")
        fig, ax = plt.subplots(figsize=(4, 4))
        ax.imshow(img if img.ndim == 3 else img, cmap=None if img.ndim == 3
                  else "viridis")
        ax.axis("off")
        fig.savefig(os.path.join(self.out_dir,
                                 f"{safe}_{self._frame:05d}.png"), dpi=80)
        plt.close(fig)
