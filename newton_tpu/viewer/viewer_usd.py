"""USD stage viewer: writes a time-sampled .usda file.

TPU-native re-design of reference newton/_src/viewer/viewer_usd.py:69. The
reference drives pxr's UsdStage; this writes the text format directly (no
pxr needed) — shape prims with UsdGeom types and per-frame
``xformOp:translate``/``xformOp:orient`` time samples, loadable in usdview
or any DCC.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..geometry.types import GeoType
from .viewer import ViewerBase

__all__ = ["ViewerUSD"]


class ViewerUSD(ViewerBase):
    def __init__(self, output_path: str = "stage.usda", fps: float = 60.0,
                 up_axis: str = "Z"):
        super().__init__()
        self.output_path = output_path
        self.fps = float(fps)
        self.up_axis = up_axis
        self._samples: Dict[int, List] = {}      # shape -> [(t, p, q)]
        self._particle_samples: List = []
        self._frames = 0

    def log_state(self, state):
        st = self.model.structure
        from ..math import transform_multiply
        import jax.numpy as jnp
        dtype = state.body_q.dtype
        sb = st.shape_body
        identity = jnp.zeros((7,), dtype=dtype).at[6].set(1.0)
        if self.model.body_count:
            X_body = jnp.where(jnp.asarray(sb < 0)[:, None], identity,
                               state.body_q[np.maximum(sb, 0)])
        else:
            X_body = jnp.broadcast_to(identity, (st.shape_count, 7))
        X_ws = np.asarray(transform_multiply(X_body,
                                             self.model.shape_transform))
        t = self.time * self.fps
        for s in range(st.shape_count):
            self._samples.setdefault(s, []).append(
                (t, X_ws[s, :3].tolist(), X_ws[s, 3:7].tolist()))
        if state.particle_count:
            self._particle_samples.append(
                (t, np.asarray(state.particle_q).tolist()))
        self._frames += 1

    def close(self):
        self.save()

    def save(self, path: Optional[str] = None):
        path = path or self.output_path
        st = self.model.structure
        scale = np.asarray(self.model.shape_scale)
        lines = ["#usda 1.0", "(", f'    upAxis = "{self.up_axis}"',
                 f"    timeCodesPerSecond = {self.fps}",
                 f"    startTimeCode = 0",
                 f"    endTimeCode = {max(self._frames - 1, 0)}", ")", ""]
        lines.append('def Xform "World"')
        lines.append("{")
        for s in range(st.shape_count):
            t = GeoType(int(st.shape_type[s]))
            name = st.shape_key[s].replace("/", "_").replace(".", "_")
            geom = {GeoType.SPHERE: "Sphere", GeoType.BOX: "Cube",
                    GeoType.CAPSULE: "Capsule", GeoType.CYLINDER: "Cylinder",
                    GeoType.PLANE: "Plane", GeoType.MESH: "Mesh"}.get(t)
            if geom is None:
                continue
            lines.append(f'    def {geom} "{name}"')
            lines.append("    {")
            if t == GeoType.SPHERE:
                lines.append(f"        double radius = {scale[s, 0]}")
            elif t == GeoType.BOX:
                lines.append("        double size = 2")
                lines.append(f"        float3 xformOp:scale = "
                             f"({scale[s, 0]}, {scale[s, 1]}, {scale[s, 2]})")
            elif t in (GeoType.CAPSULE, GeoType.CYLINDER):
                lines.append(f"        double radius = {scale[s, 0]}")
                lines.append(f"        double height = {2 * scale[s, 1]}")
                lines.append('        uniform token axis = "Z"')
            samples = self._samples.get(s, [])
            if samples:
                lines.append("        double3 xformOp:translate.timeSamples = {")
                for (tc, p, q) in samples:
                    lines.append(f"            {tc}: ({p[0]}, {p[1]}, {p[2]}),")
                lines.append("        }")
                lines.append("        quatf xformOp:orient.timeSamples = {")
                for (tc, p, q) in samples:
                    lines.append(f"            {tc}: ({q[3]}, {q[0]}, {q[1]}, {q[2]}),")
                lines.append("        }")
                ops = ['"xformOp:translate"', '"xformOp:orient"']
                if t == GeoType.BOX:
                    ops.append('"xformOp:scale"')
                lines.append(f"        uniform token[] xformOpOrder = "
                             f"[{', '.join(ops)}]")
            lines.append("    }")
        if self._particle_samples:
            lines.append('    def Points "particles"')
            lines.append("    {")
            lines.append("        point3f[] points.timeSamples = {")
            for (tc, pts) in self._particle_samples:
                pts_s = ", ".join(f"({p[0]}, {p[1]}, {p[2]})" for p in pts)
                lines.append(f"            {tc}: [{pts_s}],")
            lines.append("        }")
            lines.append("    }")
        lines.append("}")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
