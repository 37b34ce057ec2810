"""Tiled ray-traced camera sensor.

TPU-native re-design of reference
newton/_src/sensors/sensor_tiled_camera.py:45 + warp_raytrace/ (4487 LoC).
The reference traces BVHs per world with Warp kernels; here the whole
(camera x H x W) ray grid is one dense batched raycast against the model's
primitive shapes (geometry/raycast.py) — a single fused XLA program that
maps onto the VPU, no BVH needed at robot-scene shape counts. Channels
mirror the reference: depth, normal, shape index, and Lambertian-shaded
color.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..geometry.raycast import raycast_model
from ..math import quat_rotate, quat_to_matrix, transform_multiply
from ..sim.model import Model
from ..sim.state import State

__all__ = ["SensorTiledCamera"]


class SensorTiledCamera:
    """Batched pinhole camera (reference: sensor_tiled_camera.py:46-60).

    Args:
        model: finalized model.
        width/height: image resolution.
        fov_y: vertical field of view (radians).
        light_dir: world-frame directional light for the color channel.

    ``render(state, cam_xforms)`` takes (n_cams, 7) camera world transforms
    (camera looks along -Z, +Y up, like the reference) and returns a dict of
    channels: depth (n,H,W), normal (n,H,W,3), shape_index (n,H,W) int32,
    color (n,H,W,3).
    """

    def __init__(self, model: Model, width: int = 64, height: int = 64,
                 fov_y: float = 1.0, light_dir=(0.3, 0.2, -0.9),
                 max_dist: float = 100.0, shadows: bool = False,
                 checker_texture: bool = False,
                 light_intensity: float = 1.0, ambient: float = 0.15):
        self.model = model
        self.width = int(width)
        self.height = int(height)
        self.fov_y = float(fov_y)
        self.max_dist = float(max_dist)
        # extended channels (reference warp_raytrace: hdr/albedo/texture +
        # shadowed lighting): shadows fire a secondary occlusion ray per
        # hit; checker_texture modulates albedo procedurally in world space
        self.shadows = bool(shadows)
        self.checker_texture = bool(checker_texture)
        self.light_intensity = float(light_intensity)
        self.ambient = float(ambient)
        ld = np.asarray(light_dir, dtype=np.float64)
        self.light_dir = ld / np.linalg.norm(ld)

        # pixel ray directions in camera frame (H, W, 3), looking along -Z
        aspect = self.width / self.height
        tan_y = np.tan(0.5 * self.fov_y)
        ys = np.linspace(tan_y, -tan_y, self.height)
        xs = np.linspace(-tan_y * aspect, tan_y * aspect, self.width)
        gx, gy = np.meshgrid(xs, ys)
        dirs = np.stack([gx, gy, -np.ones_like(gx)], axis=-1)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        self._pixel_dirs = dirs.reshape(-1, 3).astype(np.float32)

        # gaussian splat sources (reference: sensors/warp_raytrace/
        # gaussians.py renders the same clouds): flatten every
        # GeoType.GAUSSIAN shape into per-splat static arrays
        self._splats = None
        g_srcs = getattr(model.structure, "gaussians", [])
        if g_srcs:
            sh, mean, rot, inv_s2, col, alp = [], [], [], [], [], []
            for s, src in g_srcs:
                means = np.asarray(src["means"], dtype=np.float64)
                if len(means) == 0:
                    continue
                scales = np.maximum(np.asarray(src["scales"],
                                               dtype=np.float64), 1e-4)
                quats = np.asarray(src["quats"], dtype=np.float64)
                if quats.shape != means.shape[:1] + (4,):
                    quats = np.tile([0.0, 0, 0, 1.0], (len(means), 1))
                colors = src.get("colors")
                colors = (np.full((len(means), 3), 0.9)
                          if colors is None else np.asarray(colors))
                ops = src.get("opacities")
                ops = (np.full(len(means), 0.6)
                       if ops is None else np.asarray(ops))
                for k in range(len(means)):
                    x_, y_, z_, w_ = quats[k]
                    R_ = np.array([
                        [1 - 2 * (y_ * y_ + z_ * z_),
                         2 * (x_ * y_ - z_ * w_), 2 * (x_ * z_ + y_ * w_)],
                        [2 * (x_ * y_ + z_ * w_),
                         1 - 2 * (x_ * x_ + z_ * z_),
                         2 * (y_ * z_ - x_ * w_)],
                        [2 * (x_ * z_ - y_ * w_), 2 * (y_ * z_ + x_ * w_),
                         1 - 2 * (x_ * x_ + y_ * y_)]])
                    sh.append(s)
                    mean.append(means[k])
                    rot.append(R_)
                    inv_s2.append(1.0 / scales[k] ** 2)
                    col.append(colors[k])
                    alp.append(ops[k])
            if sh:
                self._splats = dict(
                    shape=np.asarray(sh, dtype=np.int32),
                    mean=np.asarray(mean, dtype=np.float32),
                    rot=np.asarray(rot, dtype=np.float32),
                    inv_s2=np.asarray(inv_s2, dtype=np.float32),
                    color=np.asarray(col, dtype=np.float32),
                    alpha=np.asarray(alp, dtype=np.float32))

    def render(self, state: State, cam_xforms) -> dict:
        model = self.model
        cam_xforms = jnp.asarray(cam_xforms)
        if cam_xforms.ndim == 1:
            cam_xforms = cam_xforms[None]
        n = cam_xforms.shape[0]
        H, W = self.height, self.width
        R = H * W

        d_cam = jnp.asarray(self._pixel_dirs, dtype=cam_xforms.dtype)
        d_world = quat_rotate(cam_xforms[:, None, 3:7], d_cam[None, :, :])
        o_world = jnp.broadcast_to(cam_xforms[:, None, 0:3], d_world.shape)

        t, shape, nrm = raycast_model(
            model, state, o_world.reshape(n * R, 3), d_world.reshape(n * R, 3),
            max_dist=self.max_dist)
        hit = shape >= 0
        depth = jnp.where(hit, t, 0.0).reshape(n, H, W)
        normal = jnp.where(hit[:, None], nrm, 0.0).reshape(n, H, W, 3)
        shape_index = shape.reshape(n, H, W)

        # Lambertian shading with a per-shape pseudo-color
        key_colors = _shape_palette(model.structure.shape_count,
                                    dtype=cam_xforms.dtype)
        base = jnp.where(hit[:, None], key_colors[jnp.maximum(shape, 0)], 0.0)
        p_hit = (o_world.reshape(n * R, 3)
                 + d_world.reshape(n * R, 3) * t[:, None])
        if self.checker_texture:
            # procedural world-space checker (reference texture channel)
            ck = jnp.sum(jnp.floor(p_hit * 4.0), axis=-1) % 2.0
            base = base * (0.6 + 0.4 * ck)[:, None]
        lam = jnp.maximum(
            -jnp.sum(nrm * jnp.asarray(self.light_dir, dtype=nrm.dtype), -1),
            0.1)
        if self.shadows:
            # secondary occlusion ray toward the light
            so = p_hit + nrm * 1e-3
            sd = jnp.broadcast_to(
                -jnp.asarray(self.light_dir, dtype=nrm.dtype), so.shape)
            _, s_shape, _ = raycast_model(model, state, so, sd,
                                          max_dist=self.max_dist)
            lit = (s_shape < 0) | ~hit
            lam = jnp.where(lit, lam, 0.0)
        albedo = base.reshape(n, H, W, 3)
        hdr = (base * (self.light_intensity * lam[:, None] + self.ambient)
               ).reshape(n, H, W, 3)
        # LDR color: legacy direct shading without shadows (golden-image
        # stable); Reinhard-tonemapped radiance when shadowing
        color = ((base * lam[:, None]).reshape(n, H, W, 3)
                 if not self.shadows else hdr / (1.0 + hdr))
        out = dict(depth=depth, normal=normal, shape_index=shape_index,
                   color=color, albedo=albedo, hdr=hdr)
        if self._splats is not None:
            c_flat, a_flat = self._composite_splats(
                model, state, o_world.reshape(n * R, 3),
                d_world.reshape(n * R, 3),
                jnp.where(hit, t, self.max_dist),
                color.reshape(n * R, 3))
            out["color"] = c_flat.reshape(n, H, W, 3)
            out["splat_alpha"] = a_flat.reshape(n, H, W)
        return out

    def _composite_splats(self, model, state, o, d, t_bg, bg_color):
        """Front-to-back alpha compositing of 3D gaussians along each ray
        (reference: warp_raytrace/gaussians.py). Peak ray density in closed
        form per (ray, splat); splats behind the surface hit are occluded."""
        sp = self._splats
        dtype = o.dtype
        body = np.maximum(np.asarray(
            model.structure.shape_body)[sp["shape"]], 0)
        is_static = (np.asarray(
            model.structure.shape_body)[sp["shape"]] < 0)
        X_bs = model.shape_transform[sp["shape"]]          # (G, 7)
        identity = jnp.zeros((7,), dtype=dtype).at[6].set(1.0)
        X_wb = jnp.where(jnp.asarray(is_static)[:, None], identity,
                         state.body_q[body])
        X_ws = transform_multiply(X_wb, X_bs)
        mu = X_ws[:, 0:3] + quat_rotate(X_ws[:, 3:7],
                                        jnp.asarray(sp["mean"], dtype))
        R_w = quat_to_matrix(X_ws[:, 3:7])                 # (G, 3, 3)
        W_ = jnp.einsum("gij,gjk->gik", R_w, jnp.asarray(sp["rot"], dtype))
        inv_cov = jnp.einsum("gij,gj,gkj->gik", W_,
                             jnp.asarray(sp["inv_s2"], dtype), W_)

        do = o[:, None, :] - mu[None, :, :]                # (P, G, 3)
        Sd = jnp.einsum("gij,pj->pgi", inv_cov, d)         # (P, G, 3)
        a = jnp.maximum(jnp.einsum("pgi,pi->pg", Sd, d), 1e-9)
        b = jnp.einsum("pgi,pgi->pg",
                       jnp.einsum("gij,pgj->pgi", inv_cov, do),
                       jnp.broadcast_to(d[:, None, :], do.shape))
        t_star = -b / a
        q0 = jnp.einsum("pgi,gij,pgj->pg", do, inv_cov, do)
        dens = jnp.exp(-0.5 * jnp.maximum(q0 - b * b / a, 0.0))
        alpha = jnp.clip(jnp.asarray(sp["alpha"], dtype)[None] * dens,
                         0.0, 0.99)
        valid = (t_star > 1e-3) & (t_star < t_bg[:, None])
        alpha = jnp.where(valid, alpha, 0.0)

        # composite in depth order: sort splats by t*
        order = jnp.argsort(jnp.where(valid, t_star, self.max_dist), axis=1)
        alpha_s = jnp.take_along_axis(alpha, order, axis=1)
        col_s = jnp.asarray(sp["color"], dtype)[order]     # (P, G, 3)
        trans = jnp.cumprod(1.0 - alpha_s, axis=1)
        trans_before = jnp.concatenate(
            [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=1)
        w_ = alpha_s * trans_before
        c_out = jnp.einsum("pg,pgc->pc", w_, col_s) + trans[:, -1:] * bg_color
        return c_out, 1.0 - trans[:, -1]


def _shape_palette(n_shapes: int, dtype):
    i = jnp.arange(max(n_shapes, 1), dtype=dtype)
    return jnp.stack([
        0.5 + 0.5 * jnp.sin(0.9 * i + 0.0),
        0.5 + 0.5 * jnp.sin(0.9 * i + 2.1),
        0.5 + 0.5 * jnp.sin(0.9 * i + 4.2),
    ], axis=-1)
