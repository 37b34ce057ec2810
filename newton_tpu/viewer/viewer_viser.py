"""Viser web viewer backend (reference: newton/_src/viewer/viewer_viser.py:24).

Requires the optional ``viser`` package (web-based 3D viewer). Shapes are
registered once from the Model; per-frame state updates move the
corresponding scene-graph frames. Falls back with a clear ImportError when
viser isn't installed (this image does not bundle it).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..geometry.types import GeoType
from .viewer import ViewerBase

__all__ = ["ViewerViser"]


class ViewerViser(ViewerBase):
    """Web viewer via viser (reference: viewer_viser.py:24)."""

    def __init__(self, host: str = "0.0.0.0", port: int = 8080):
        try:
            import viser
        except ImportError as e:
            raise ImportError(
                "ViewerViser requires the optional 'viser' package "
                "(pip install viser)") from e
        super().__init__()
        self._server = viser.ViserServer(host=host, port=port)
        self._frames = {}

    def set_model(self, model):
        super().set_model(model)
        st = model.structure
        shape_tf = np.asarray(model.shape_transform)
        scale = np.asarray(model.shape_scale)
        for i in range(st.shape_count):
            t = GeoType(int(st.shape_type[i]))
            name = f"/shapes/{st.shape_key[i]}"
            if t == GeoType.SPHERE:
                self._server.scene.add_icosphere(
                    name, radius=float(scale[i, 0]))
            elif t == GeoType.BOX:
                self._server.scene.add_box(
                    name, dimensions=tuple(2.0 * scale[i]))
            elif t in (GeoType.MESH, GeoType.CONVEX):
                src = None
                try:
                    src = model.structure.shape_source[i]
                except Exception:
                    pass
                if src is not None and hasattr(src, "vertices"):
                    self._server.scene.add_mesh_simple(
                        name, vertices=np.asarray(src.vertices),
                        faces=np.asarray(src.indices).reshape(-1, 3))
            # other types: represented by their frame only
            self._frames[i] = self._server.scene.add_frame(
                name + "/frame", show_axes=False)

    def log_state(self, state):
        from ..math import transform_multiply
        import jax.numpy as jnp
        st = self.model.structure
        sb = np.asarray(st.shape_body)
        bq = np.asarray(state.body_q)
        stf = np.asarray(self.model.shape_transform)
        for i, frame in self._frames.items():
            b = int(sb[i])
            if b >= 0:
                X = np.asarray(transform_multiply(
                    jnp.asarray(bq[b]), jnp.asarray(stf[i])))
            else:
                X = stf[i]
            frame.position = tuple(X[:3])
            q = X[3:7]
            frame.wxyz = (float(q[3]), float(q[0]), float(q[1]), float(q[2]))

    def log_points(self, name, points, radius=0.01, colors=None):
        p = np.asarray(points)
        c = (np.asarray(colors) if colors is not None
             else np.full((len(p), 3), 0.8))
        self._server.scene.add_point_cloud(name, points=p, colors=c,
                                           point_size=float(radius))

    def log_lines(self, name, starts, ends, colors=None):
        seg = np.stack([np.asarray(starts), np.asarray(ends)], axis=1)
        self._server.scene.add_line_segments(name, points=seg)

    def is_running(self) -> bool:
        return True
