"""Scene authoring API: host-side ``ModelBuilder`` -> frozen ``Model`` pytree.

TPU-native re-design of reference newton/_src/sim/builder.py:185-12710. The
authoring surface matches the reference (add_body/add_joint_*/add_shape_*/
add_articulation/worlds/replicate/particles/cloth/soft bodies/equality
constraints/custom attributes/finalize) but the output is a JAX pytree
(:class:`newton_tpu.sim.model.Model`) with **build-time static collision
candidate pairs and per-pair contact slot budgets** — the fixed-shape design
jitted TPU kernels require (the reference reaches the same place at runtime
with atomic counters; we precompute it, reference builder.py:12413).

Host storage is plain Python lists + float64 numpy; nothing touches the
device until :meth:`ModelBuilder.finalize`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace as dc_replace
from typing import Any, Dict, List, Optional, Sequence, Set, Tuple, Union

import numpy as np

from ..core.host_math import (
    np_quat_between_axes,
    np_quat_identity,
    np_quat_mul,
    np_quat_rotate,
    np_transform,
    np_transform_identity,
    np_transform_inverse,
    np_transform_multiply,
    np_transform_point,
    np_transform_vector,
)
from ..core.types import MAXVAL, Axis, AxisType, axis_to_vec3
from ..geometry.flags import ParticleFlags, ShapeFlags
from ..geometry.inertia import (
    compute_box_inertia,
    compute_capsule_inertia,
    compute_cone_inertia,
    compute_cylinder_inertia,
    compute_ellipsoid_inertia,
    compute_mesh_inertia,
    compute_sphere_inertia,
    transform_inertia,
)
from ..geometry.types import SDF, GeoType, Heightfield, Mesh
from .enums import BodyFlags, EqType, JointType

# shapes requesting an SDF bake at or above this resolution get sparse
# quantized texture storage (geometry/sdf_texture.py) instead of a dense
# pooled grid; below it a dense bake is smaller and faster to sample
_SDF_TEXTURE_MIN_RES = 48
from .model import (
    AttributeAssignment,
    AttributeFrequency,
    AttributeSpec,
    Model,
    ModelStructure,
)

__all__ = ["ModelBuilder", "ShapeConfig", "JointDofConfig"]

Vec3 = Union[Sequence[float], np.ndarray]
Transform = Union[Sequence[float], np.ndarray]


def _as_transform(xform: Optional[Transform]) -> np.ndarray:
    if xform is None:
        return np_transform_identity()
    t = np.asarray(xform, dtype=np.float64).reshape(-1)
    if t.shape[0] != 7:
        raise ValueError(f"Transform must have 7 components [p, q_xyzw], got {t.shape}")
    return t.copy()


@dataclass
class ShapeConfig:
    """Shape configuration defaults (reference: builder.py:558).

    Attributes mirror the reference's ``ModelBuilder.ShapeConfig``: density
    drives body mass/inertia accumulation; ke/kd/kf/mu/restitution are the
    contact material; ``collision_group`` partitions broad phase
    (0 = no collision, >0 collides within the same group and with negative
    groups, <0 collides with everything except its own negative counterpart —
    reference geometry/broad_phase_common.py:174); ``collision_filter_parent``
    parent-child joint pairs.
    """

    density: float = 1000.0
    ke: float = 1.0e5
    kd: float = 1000.0
    kf: float = 1000.0
    ka: float = 0.0
    # hydroelastic modulus (Pa/m): pressure = kh * penetration on the
    # equal-pressure surface (reference builder.py ShapeConfig.kh,
    # sdf_hydroelastic.py:147 linear_pressure). Only consumed when the
    # collision pipeline runs with hydroelastic=True.
    kh: float = 1.0e6
    mu: float = 0.5
    restitution: float = 0.0
    thickness: float = 1.0e-5
    is_solid: bool = True
    collision_group: int = 1
    collision_filter_parent: bool = True
    has_shape_collision: bool = True
    has_particle_collision: bool = True
    is_visible: bool = True
    is_site: bool = False
    contype: int = 1
    conaffinity: int = 1
    sdf_max_resolution: int = 0  # >0: bake an SDF for mesh-mesh contact

    @property
    def flags(self) -> int:
        f = 0
        if self.is_visible:
            f |= int(ShapeFlags.VISIBLE)
        if self.has_shape_collision and not self.is_site:
            f |= int(ShapeFlags.COLLIDE_SHAPES)
        if self.has_particle_collision and not self.is_site:
            f |= int(ShapeFlags.COLLIDE_PARTICLES)
        if self.is_site:
            f |= int(ShapeFlags.SITE)
        return f

    def copy(self) -> "ShapeConfig":
        return dc_replace(self)

    def mark_as_site(self) -> "ShapeConfig":
        cfg = dc_replace(self)
        cfg.is_site = True
        cfg.density = 0.0
        cfg.has_shape_collision = False
        cfg.has_particle_collision = False
        cfg.collision_group = 0
        return cfg


@dataclass
class JointDofConfig:
    """Per-dof joint configuration (reference: builder.py:790)."""

    axis: AxisType = Axis.X
    limit_lower: float = -MAXVAL
    limit_upper: float = MAXVAL
    limit_ke: float = 1.0e4
    limit_kd: float = 1.0e1
    target: float = 0.0
    target_ke: float = 0.0
    target_kd: float = 0.0
    armature: float = 1.0e-2
    effort_limit: float = MAXVAL
    velocity_limit: float = MAXVAL
    friction: float = 0.0

    def copy(self) -> "JointDofConfig":
        return dc_replace(self)


@dataclass
class CustomAttribute:
    """Custom (namespaced) attribute declaration (reference: builder.py:807)."""

    name: str
    frequency: AttributeFrequency
    assignment: AttributeAssignment = AttributeAssignment.MODEL
    shape: Tuple[int, ...] = ()
    dtype: Any = np.float32
    default: Any = 0.0
    values: Dict[int, Any] = field(default_factory=dict)

    def spec(self) -> AttributeSpec:
        return AttributeSpec(self.name, self.frequency, self.assignment,
                             self.shape, self.dtype, self.default)


# contact-slot budgets live with the narrow phase (single source of truth)
from ..geometry.narrow_phase import pair_slot_count as _pair_slots


class ModelBuilder:
    """Host-side scene construction (reference: builder.py:185).

    Typical usage matches the reference::

        builder = ModelBuilder()
        b = builder.add_body(xform=..., mass=1.0)
        builder.add_shape_box(b, hx=0.5, hy=0.5, hz=0.5)
        builder.add_joint_revolute(parent=-1, child=b, axis="Z")
        model = builder.finalize()
    """

    def __init__(self, up_axis: AxisType = Axis.Z, gravity: float = -9.81):
        self.up_axis = Axis.from_any(up_axis) if not isinstance(up_axis, (list, tuple, np.ndarray)) else Axis.Z
        self.gravity = float(gravity)

        self.default_shape_cfg = ShapeConfig()
        # contact sample points per mesh/primitive shape (mesh narrow phase
        # budget; reference uses triangle-pair expansion instead)
        self.mesh_sample_count = 32
        self.default_joint_cfg = JointDofConfig()
        self.default_site_cfg = ShapeConfig().mark_as_site()

        # solver tunables carried onto the Model (reference builder attrs)
        self.num_rigid_contacts_per_world: Optional[int] = None
        self.soft_contact_ke = 1.0e3
        self.soft_contact_kd = 10.0
        self.soft_contact_kf = 1.0e3
        self.soft_contact_mu = 0.5
        self.soft_contact_margin = 0.2
        self.particle_ke = 1.0e3
        self.particle_kd = 1.0e2
        self.particle_kf = 1.0e2
        self.particle_mu = 0.5
        self.particle_cohesion = 0.0
        self.particle_adhesion = 0.0
        self.particle_max_velocity = 1.0e5

        # worlds
        self.world_count = 0
        self._current_world = -1
        self.world_gravity: List[np.ndarray] = []
        self.world_key: List[str] = []

        # bodies
        self.body_q: List[np.ndarray] = []
        self.body_qd: List[np.ndarray] = []
        self.body_com: List[np.ndarray] = []
        self.body_mass: List[float] = []
        self.body_inertia: List[np.ndarray] = []
        self.body_flags: List[int] = []
        self.body_world: List[int] = []
        self.body_key: List[str] = []

        # shapes
        self.shape_transform: List[np.ndarray] = []
        self.shape_body: List[int] = []
        self.shape_type: List[int] = []
        self.shape_scale: List[np.ndarray] = []
        self.shape_flags: List[int] = []
        self.shape_thickness: List[float] = []
        self.shape_material_mu: List[float] = []
        self.shape_material_restitution: List[float] = []
        self.shape_material_ke: List[float] = []
        self.shape_material_kd: List[float] = []
        self.shape_material_kf: List[float] = []
        self.shape_material_kh: List[float] = []
        self.shape_collision_group: List[int] = []
        # MuJoCo-style bitmasks: pair collides iff (contype_a & conaffinity_b)
        # or (contype_b & conaffinity_a) (reference mjcf importer semantics)
        self.shape_contype: List[int] = []
        self.shape_conaffinity: List[int] = []
        self.shape_world: List[int] = []
        self.shape_source: List[Any] = []  # Mesh/SDF/Heightfield or None
        # per-shape requested SDF bake resolution (0 = pipeline default;
        # >= _SDF_TEXTURE_MIN_RES selects sparse quantized texture storage)
        self.shape_sdf_resolution: List[int] = []
        self.shape_key: List[str] = []
        self.shape_collision_filter_pairs: Set[Tuple[int, int]] = set()

        # joints (per-joint)
        self.joint_type: List[int] = []
        self.joint_parent: List[int] = []
        self.joint_child: List[int] = []
        self.joint_X_p: List[np.ndarray] = []
        self.joint_X_c: List[np.ndarray] = []
        self.joint_key: List[str] = []
        self.joint_world: List[int] = []
        self.joint_enabled: List[bool] = []
        self.joint_articulation: List[int] = []
        self.joint_q_start: List[int] = [0]
        self.joint_qd_start: List[int] = [0]
        self.joint_dof_dim: List[Tuple[int, int]] = []  # (lin_axes, ang_axes)
        # joints (per-dof)
        self.joint_axis: List[np.ndarray] = []
        self.joint_armature: List[float] = []
        self.joint_target_ke: List[float] = []
        self.joint_target_kd: List[float] = []
        self.joint_limit_lower: List[float] = []
        self.joint_limit_upper: List[float] = []
        self.joint_limit_ke: List[float] = []
        self.joint_limit_kd: List[float] = []
        self.joint_friction: List[float] = []
        self.joint_effort_limit: List[float] = []
        self.joint_velocity_limit: List[float] = []
        self.joint_qd: List[float] = []
        self.joint_dof_mode: List[int] = []
        # joints (per-coord)
        self.joint_q: List[float] = []
        self.joint_target_q: List[float] = []

        # articulations
        self.articulation_start: List[int] = []
        self.articulation_key: List[str] = []
        self.articulation_world: List[int] = []

        # particles / cloth / soft
        self.particle_q: List[np.ndarray] = []
        self.particle_qd: List[np.ndarray] = []
        self.particle_mass: List[float] = []
        self.particle_radius: List[float] = []
        self.particle_flags: List[int] = []
        self.particle_world: List[int] = []

        self.spring_indices: List[Tuple[int, int]] = []
        self.spring_rest_length: List[float] = []
        self.spring_stiffness: List[float] = []
        self.spring_damping: List[float] = []

        self.tri_indices: List[Tuple[int, int, int]] = []
        self.tri_poses: List[np.ndarray] = []
        self.tri_materials: List[Tuple[float, float, float, float, float]] = []
        self.tri_areas: List[float] = []

        self.edge_indices: List[Tuple[int, int, int, int]] = []
        self.edge_rest_angle: List[float] = []
        self.edge_rest_length: List[float] = []
        self.edge_bending_properties: List[Tuple[float, float]] = []

        self.tet_indices: List[Tuple[int, int, int, int]] = []
        self.tet_poses: List[np.ndarray] = []
        self.tet_materials: List[Tuple[float, float, float]] = []

        # fixed tendons: linear joint-coordinate couplings
        # (reference: mujoco tendon support, solver_mujoco.py fixed tendons)
        self.tendon_joints: List[List[int]] = []
        self.tendon_coefs: List[List[float]] = []
        self.tendon_params: List[Tuple[float, float, float]] = []  # ke,kd,L0
        self.tendon_key: List[str] = []

        # spatial tendons: site-routed paths with sphere/cylinder wrap geoms
        # (reference: MJCF <spatial> tendons incl. wrap arrays,
        # newton/_src/utils/import_mjcf.py:2865-2868; path solve in
        # sim/tendon.py)
        self.sten_paths: List["SpatialTendonPath"] = []
        self.sten_params: List[Tuple[float, float, float]] = []  # ke,kd,L0
        self.sten_key: List[str] = []

        # muscles (reference: builder.py:6303)
        self.muscle_start: List[int] = []
        self.muscle_params: List[Tuple[float, float, float, float, float]] = []
        self.muscle_bodies: List[int] = []
        self.muscle_points: List[np.ndarray] = []
        self.muscle_activations: List[float] = []

        # equality constraints
        self.eq_type: List[int] = []
        self.eq_obj1: List[int] = []
        self.eq_obj2: List[int] = []
        self.eq_anchor: List[np.ndarray] = []
        self.eq_relpose: List[np.ndarray] = []
        self.eq_polycoef: List[np.ndarray] = []
        self.eq_enabled: List[bool] = []
        self.eq_torquescale: List[float] = []
        self.eq_world: List[int] = []
        self.eq_key: List[str] = []

        # custom attribute registry
        self.custom_attributes: Dict[str, CustomAttribute] = {}

        # requested extended attrs
        self._requested_state_attrs: Set[str] = set()
        self._requested_contact_attrs: Set[str] = set()

    # ------------------------------------------------------------------
    # counts
    # ------------------------------------------------------------------
    @property
    def body_count(self) -> int:
        return len(self.body_q)

    @property
    def shape_count(self) -> int:
        return len(self.shape_type)

    @property
    def joint_count(self) -> int:
        return len(self.joint_type)

    @property
    def joint_coord_count(self) -> int:
        return len(self.joint_q)

    @property
    def joint_dof_count(self) -> int:
        return len(self.joint_qd)

    @property
    def particle_count(self) -> int:
        return len(self.particle_q)

    @property
    def articulation_count(self) -> int:
        return len(self.articulation_start)

    @property
    def spring_count(self) -> int:
        return len(self.spring_indices)

    @property
    def tri_count(self) -> int:
        return len(self.tri_indices)

    @property
    def edge_count(self) -> int:
        return len(self.edge_indices)

    @property
    def tet_count(self) -> int:
        return len(self.tet_indices)

    @property
    def current_world(self) -> int:
        return self._current_world

    @property
    def up_vector(self) -> np.ndarray:
        return axis_to_vec3(self.up_axis)

    def _gravity_vec(self) -> np.ndarray:
        return self.up_vector * self.gravity

    # ------------------------------------------------------------------
    # worlds (reference: builder.py:3814-3950)
    # ------------------------------------------------------------------
    def begin_world(self, key: Optional[str] = None,
                    gravity: Optional[Vec3] = None) -> int:
        """Open a world scope; subsequent entities belong to it."""
        if self._current_world != -1:
            raise RuntimeError(
                f"Already in world context {self._current_world}; call end_world() first.")
        self._current_world = self.world_count
        self.world_count += 1
        self.world_key.append(key or f"world_{self._current_world}")
        if gravity is not None:
            self.world_gravity.append(np.asarray(gravity, dtype=np.float64))
        else:
            self.world_gravity.append(self._gravity_vec())
        return self._current_world

    def end_world(self):
        if self._current_world == -1:
            raise RuntimeError("Not in a world context.")
        self._current_world = -1

    def add_world(self, builder: "ModelBuilder",
                  xform: Optional[Transform] = None,
                  key_prefix: Optional[str] = None) -> int:
        """Add a sub-builder as a new world (reference: builder.py:3904)."""
        w = self.begin_world()
        try:
            self.add_builder(builder, xform=xform, key_prefix=key_prefix)
        finally:
            self.end_world()
        return w

    def replicate(self, builder: "ModelBuilder", count: int,
                  spacing: Optional[Vec3] = None) -> None:
        """Add ``count`` copies of ``builder``, one world each
        (reference: builder.py:2553). Enables the homogeneous vmap fast path.

        Pure replication (no spacing) takes a vectorized bulk-merge path:
        per-entity Python loops are O(count * entities) and dominate
        model-build time at RL world counts (the reference tracks build time
        in its setup benchmarks, asv/benchmarks/setup/bench_model.py).
        """
        if spacing is None and self._current_world == -1:
            self._replicate_bulk(builder, count)
            return
        for i in range(count):
            xform = None
            if spacing is not None:
                s = np.asarray(spacing, dtype=np.float64)
                # lay out worlds on a grid for visualization parity
                n = max(1, int(math.ceil(math.sqrt(count))))
                offset = np.array([(i % n) * s[0], (i // n) * s[1],
                                   0.0 if len(s) < 3 else (0.0)])
                xform = np_transform(p=offset)
            self.add_world(builder, xform=xform)

    def _replicate_bulk(self, o: "ModelBuilder", count: int) -> None:
        """Vectorized N-copy merge of a sub-builder, one world per copy."""
        w0 = self.world_count
        b0 = self.body_count
        s0 = self.shape_count
        j0 = self.joint_count
        p0 = self.particle_count
        a0 = self.articulation_count
        e0 = len(self.eq_type)
        nb, ns, nj = o.body_count, o.shape_count, o.joint_count
        npart, na, ne = o.particle_count, o.articulation_count, len(o.eq_type)
        nq = o.joint_coord_count
        nd = o.joint_dof_count

        self.world_count += count
        self.world_key += [f"world_{w0 + i}" for i in range(count)]
        self.world_gravity += [self._gravity_vec()] * count

        def rep_list(lst):
            return [x.copy() if isinstance(x, np.ndarray) else x
                    for _ in range(count) for x in lst]

        def rep_offset(lst, base, stride, keep_neg=True):
            out = []
            for i in range(count):
                off = base + i * stride
                out.extend((x + off if (x >= 0 or not keep_neg) else x)
                           for x in lst)
            return out

        # bodies
        self.body_q += rep_list(o.body_q)
        self.body_qd += rep_list(o.body_qd)
        self.body_com += rep_list(o.body_com)
        self.body_mass += list(o.body_mass) * count
        self.body_inertia += rep_list(o.body_inertia)
        self.body_flags += list(o.body_flags) * count
        self.body_world += [w0 + i for i in range(count) for _ in range(nb)]
        self.body_key += [k for i in range(count) for k in o.body_key]

        # shapes
        self.shape_transform += rep_list(o.shape_transform)
        self.shape_body += rep_offset(o.shape_body, b0, nb)
        self.shape_type += list(o.shape_type) * count
        self.shape_scale += rep_list(o.shape_scale)
        self.shape_flags += list(o.shape_flags) * count
        self.shape_thickness += list(o.shape_thickness) * count
        self.shape_material_mu += list(o.shape_material_mu) * count
        self.shape_material_restitution += list(o.shape_material_restitution) * count
        self.shape_material_ke += list(o.shape_material_ke) * count
        self.shape_material_kd += list(o.shape_material_kd) * count
        self.shape_material_kf += list(o.shape_material_kf) * count
        self.shape_material_kh += list(o.shape_material_kh) * count
        self.shape_collision_group += list(o.shape_collision_group) * count
        self.shape_contype += list(o.shape_contype) * count
        self.shape_conaffinity += list(o.shape_conaffinity) * count
        self.shape_world += [w0 + i for i in range(count) for _ in range(ns)]
        self.shape_source += list(o.shape_source) * count
        self.shape_sdf_resolution += list(o.shape_sdf_resolution) * count
        self.shape_key += list(o.shape_key) * count
        for i in range(count):
            off = s0 + i * ns
            self.shape_collision_filter_pairs.update(
                (a + off, b + off) for (a, b) in o.shape_collision_filter_pairs)
            boff = b0 + i * nb
            self._body_filter_pairs.update(
                (a + boff, b + boff) for (a, b) in o._body_filter_pairs)

        # articulations
        self.articulation_start += [a + j0 + i * nj
                                    for i in range(count)
                                    for a in o.articulation_start]
        self.articulation_key += list(o.articulation_key) * count
        self.articulation_world += [w0 + i for i in range(count)
                                    for _ in range(na)]

        # joints
        self.joint_type += list(o.joint_type) * count
        self.joint_parent += rep_offset(o.joint_parent, b0, nb)
        self.joint_child += rep_offset(o.joint_child, b0, nb, keep_neg=False)
        self.joint_X_p += rep_list(o.joint_X_p)
        self.joint_X_c += rep_list(o.joint_X_c)
        self.joint_key += list(o.joint_key) * count
        self.joint_world += [w0 + i for i in range(count) for _ in range(nj)]
        self.joint_enabled += list(o.joint_enabled) * count
        self.joint_articulation += [a + a0 + i * na for i in range(count)
                                    for a in o.joint_articulation]
        self.joint_dof_dim += list(o.joint_dof_dim) * count
        qs_base = self.joint_q_start[-1]
        ds_base = self.joint_qd_start[-1]
        oqs = o.joint_q_start[1:]
        ods = o.joint_qd_start[1:]
        self.joint_q_start += [qs_base + i * nq + x
                               for i in range(count) for x in oqs]
        self.joint_qd_start += [ds_base + i * nd + x
                                for i in range(count) for x in ods]
        self.joint_axis += rep_list(o.joint_axis)
        for name in ("joint_armature", "joint_target_ke", "joint_target_kd",
                     "joint_limit_lower", "joint_limit_upper",
                     "joint_limit_ke", "joint_limit_kd", "joint_friction",
                     "joint_effort_limit", "joint_velocity_limit", "joint_qd",
                     "joint_dof_mode"):
            getattr(self, name).extend(getattr(o, name) * count)
        self.joint_q += list(o.joint_q) * count
        self.joint_target_q += list(o.joint_target_q) * count

        # particles / soft topology
        self.particle_q += rep_list(o.particle_q)
        self.particle_qd += rep_list(o.particle_qd)
        self.particle_mass += list(o.particle_mass) * count
        self.particle_radius += list(o.particle_radius) * count
        self.particle_flags += list(o.particle_flags) * count
        self.particle_world += [w0 + i for i in range(count)
                                for _ in range(npart)]
        for i in range(count):
            off = p0 + i * npart
            self.spring_indices += [(a + off, b + off)
                                    for a, b in o.spring_indices]
            self.tri_indices += [(a + off, b + off, c + off)
                                 for a, b, c in o.tri_indices]
            self.edge_indices += [tuple(x + off if x >= 0 else -1 for x in e)
                                  for e in o.edge_indices]
            self.tet_indices += [tuple(x + off for x in t)
                                 for t in o.tet_indices]
        self.spring_rest_length += list(o.spring_rest_length) * count
        self.spring_stiffness += list(o.spring_stiffness) * count
        self.spring_damping += list(o.spring_damping) * count
        self.tri_poses += rep_list(o.tri_poses)
        self.tri_materials += list(o.tri_materials) * count
        self.tri_areas += list(o.tri_areas) * count
        self.edge_rest_angle += list(o.edge_rest_angle) * count
        self.edge_rest_length += list(o.edge_rest_length) * count
        self.edge_bending_properties += list(o.edge_bending_properties) * count
        self.tet_poses += rep_list(o.tet_poses)
        self.tet_materials += list(o.tet_materials) * count

        # tendons & muscles (indices offset per replica)
        for i in range(count):
            joff = j0 + i * nj
            boff = b0 + i * nb
            for js, cs, prm, k in zip(o.tendon_joints, o.tendon_coefs,
                                      o.tendon_params, o.tendon_key):
                self.tendon_joints.append([j + joff for j in js])
                self.tendon_coefs.append(list(cs))
                self.tendon_params.append(prm)
                self.tendon_key.append(k)
            for path, prm, k in zip(o.sten_paths, o.sten_params, o.sten_key):
                from .tendon import SpatialTendonPath
                elems = [(e[0], (e[1] + boff if e[1] >= 0 else -1), *e[2:])
                         for e in path.elems]
                self.sten_paths.append(SpatialTendonPath(elems))
                self.sten_params.append(prm)
                self.sten_key.append(k)
            for mi in range(len(o.muscle_params)):
                s, e = o.muscle_start[mi], (
                    o.muscle_start[mi + 1] if mi + 1 < len(o.muscle_start)
                    else len(o.muscle_bodies))
                self.muscle_start.append(len(self.muscle_bodies))
                self.muscle_params.append(o.muscle_params[mi])
                self.muscle_activations.append(o.muscle_activations[mi])
                for w in range(s, e):
                    mb = o.muscle_bodies[w]
                    self.muscle_bodies.append(mb + boff if mb >= 0 else -1)
                    self.muscle_points.append(o.muscle_points[w].copy())

        # equality constraints
        for i in range(count):
            for e in range(ne):
                ct = EqType(o.eq_type[e])
                off = (j0 + i * nj) if ct == EqType.JOINT else (b0 + i * nb)
                self.eq_type.append(o.eq_type[e])
                self.eq_obj1.append(o.eq_obj1[e] + off if o.eq_obj1[e] >= 0 else -1)
                self.eq_obj2.append(o.eq_obj2[e] + off if o.eq_obj2[e] >= 0 else -1)
                self.eq_anchor.append(o.eq_anchor[e].copy())
                self.eq_relpose.append(o.eq_relpose[e].copy())
                self.eq_polycoef.append(o.eq_polycoef[e].copy())
                self.eq_enabled.append(o.eq_enabled[e])
                self.eq_torquescale.append(o.eq_torquescale[e])
                self.eq_world.append(w0 + i)
                self.eq_key.append(o.eq_key[e])

        # custom attributes
        FREQ_OFF = {
            AttributeFrequency.BODY: (b0, nb),
            AttributeFrequency.SHAPE: (s0, ns),
            AttributeFrequency.JOINT: (j0, nj),
            AttributeFrequency.PARTICLE: (p0, npart),
            AttributeFrequency.ARTICULATION: (a0, na),
            AttributeFrequency.EQUALITY: (e0, ne),
            AttributeFrequency.JOINT_DOF: (ds_base, nd),
            AttributeFrequency.JOINT_COORD: (qs_base, nq),
        }
        for name, attr in o.custom_attributes.items():
            mine = self.add_custom_attribute(name, attr.frequency,
                                             attr.assignment, attr.shape,
                                             attr.dtype, attr.default)
            base, stride = FREQ_OFF.get(attr.frequency, (0, 0))
            for i in range(count):
                for k, v in attr.values.items():
                    mine.values[base + i * stride + k] = v
        self._requested_state_attrs.update(o._requested_state_attrs)
        self._requested_contact_attrs.update(o._requested_contact_attrs)

    # ------------------------------------------------------------------
    # bodies & articulations
    # ------------------------------------------------------------------
    def add_body(
        self,
        xform: Optional[Transform] = None,
        com: Optional[Vec3] = None,
        I_m: Optional[np.ndarray] = None,
        mass: float = 0.0,
        key: Optional[str] = None,
        qd: Optional[Vec3] = None,
        kinematic: bool = False,
    ) -> int:
        """Add a rigid body; returns its index (reference: builder.py:4347).

        Mass/inertia may be zero here and accumulated from shapes added with
        non-zero density (matching the reference's density-driven flow).
        """
        idx = self.body_count
        self.body_q.append(_as_transform(xform))
        self.body_qd.append(np.zeros(6) if qd is None else np.asarray(qd, dtype=np.float64))
        self.body_com.append(np.zeros(3) if com is None else np.asarray(com, dtype=np.float64))
        self.body_mass.append(float(mass))
        self.body_inertia.append(np.zeros((3, 3)) if I_m is None else np.asarray(I_m, dtype=np.float64))
        self.body_flags.append(int(BodyFlags.KINEMATIC) if kinematic else 0)
        self.body_world.append(self._current_world)
        self.body_key.append(key or f"body_{idx}")
        return idx

    # reference: add_link is an alias used in articulated contexts (builder.py:4261)
    add_link = add_body

    def add_articulation(self, key: Optional[str] = None) -> int:
        """Mark the start of a new articulation (reference: builder.py:3030)."""
        idx = self.articulation_count
        self.articulation_start.append(self.joint_count)
        self.articulation_key.append(key or f"articulation_{idx}")
        self.articulation_world.append(self._current_world)
        return idx

    # ------------------------------------------------------------------
    # joints (reference: builder.py:4414-5292)
    # ------------------------------------------------------------------
    def add_joint(
        self,
        joint_type: JointType,
        parent: int,
        child: int,
        linear_axes: Optional[Sequence[JointDofConfig]] = None,
        angular_axes: Optional[Sequence[JointDofConfig]] = None,
        xform_p: Optional[Transform] = None,
        xform_c: Optional[Transform] = None,
        key: Optional[str] = None,
        collision_filter_parent: bool = True,
        enabled: bool = True,
    ) -> int:
        """Generic joint between ``parent`` body (-1 = world) and ``child``."""
        joint_type = JointType(joint_type)
        linear_axes = list(linear_axes or [])
        angular_axes = list(angular_axes or [])
        num_axes = len(linear_axes) + len(angular_axes)
        dof_count, coord_count = joint_type.dof_count(num_axes)

        idx = self.joint_count
        if self.articulation_count == 0:
            self.add_articulation()
        self.joint_type.append(int(joint_type))
        self.joint_parent.append(int(parent))
        self.joint_child.append(int(child))
        self.joint_X_p.append(_as_transform(xform_p))
        self.joint_X_c.append(_as_transform(xform_c))
        self.joint_key.append(key or f"joint_{idx}")
        self.joint_world.append(self._current_world)
        self.joint_enabled.append(bool(enabled))
        self.joint_articulation.append(self.articulation_count - 1)
        self.joint_dof_dim.append((len(linear_axes), len(angular_axes)))

        # per-dof data
        axes = linear_axes + angular_axes
        if joint_type in (JointType.FREE, JointType.DISTANCE, JointType.BALL):
            # canonical axes; configs (if any) apply to all dofs uniformly
            base = axes[0] if axes else self.default_joint_cfg
            canon = [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), np.array([0, 0, 1.0])]
            dof_axes = canon * 2 if dof_count == 6 else canon
            for a in dof_axes[:dof_count]:
                self._append_dof(base, axis_override=a)
        else:
            for cfg in axes:
                self._append_dof(cfg)

        # per-coord initial values
        if joint_type == JointType.FREE or joint_type == JointType.DISTANCE:
            # initialize from child body pose relative to parent anchor
            X_wp = self.body_q[parent] if parent >= 0 else np_transform_identity()
            X_wp = np_transform_multiply(X_wp, self.joint_X_p[idx])
            X_wc = np_transform_multiply(self.body_q[child], self.joint_X_c[idx])
            rel = np_transform_multiply(np_transform_inverse(X_wp), X_wc)
            self.joint_q.extend(rel.tolist())
            self.joint_target_q.extend(rel.tolist())
        elif joint_type == JointType.BALL:
            self.joint_q.extend([0.0, 0.0, 0.0, 1.0])
            self.joint_target_q.extend([0.0, 0.0, 0.0, 1.0])
        elif joint_type != JointType.CABLE:  # cables carry no coords
            for cfg in axes:
                self.joint_q.append(float(cfg.target) if cfg.target_ke > 0 else 0.0)
                self.joint_target_q.append(float(cfg.target))

        self.joint_q_start.append(self.joint_q_start[-1] + coord_count)
        self.joint_qd_start.append(self.joint_qd_start[-1] + dof_count)

        if collision_filter_parent and parent >= 0:
            self._filter_body_pair(parent, child)
        return idx

    def _append_dof(self, cfg: JointDofConfig, axis_override: Optional[np.ndarray] = None):
        axis = axis_override if axis_override is not None else axis_to_vec3(cfg.axis)
        self.joint_axis.append(np.asarray(axis, dtype=np.float64))
        self.joint_armature.append(float(cfg.armature))
        self.joint_target_ke.append(float(cfg.target_ke))
        self.joint_target_kd.append(float(cfg.target_kd))
        self.joint_limit_lower.append(float(cfg.limit_lower))
        self.joint_limit_upper.append(float(cfg.limit_upper))
        self.joint_limit_ke.append(float(cfg.limit_ke))
        self.joint_limit_kd.append(float(cfg.limit_kd))
        self.joint_friction.append(float(cfg.friction))
        self.joint_effort_limit.append(float(cfg.effort_limit))
        self.joint_velocity_limit.append(float(cfg.velocity_limit))
        self.joint_qd.append(0.0)
        self.joint_dof_mode.append(0)

    def _dof_cfg(self, axis: AxisType, **kwargs) -> JointDofConfig:
        cfg = self.default_joint_cfg.copy()
        cfg.axis = axis
        for k, v in kwargs.items():
            if v is not None:
                setattr(cfg, k, v)
        return cfg

    def add_joint_revolute(
        self, parent: int, child: int, axis: AxisType = Axis.X,
        xform_p: Optional[Transform] = None, xform_c: Optional[Transform] = None,
        target: Optional[float] = None, target_ke: Optional[float] = None,
        target_kd: Optional[float] = None, limit_lower: Optional[float] = None,
        limit_upper: Optional[float] = None, limit_ke: Optional[float] = None,
        limit_kd: Optional[float] = None, armature: Optional[float] = None,
        effort_limit: Optional[float] = None, velocity_limit: Optional[float] = None,
        friction: Optional[float] = None, key: Optional[str] = None,
        collision_filter_parent: bool = True, enabled: bool = True,
    ) -> int:
        """Revolute (hinge) joint (reference: builder.py:4414)."""
        cfg = self._dof_cfg(axis, target=target, target_ke=target_ke,
                            target_kd=target_kd, limit_lower=limit_lower,
                            limit_upper=limit_upper, limit_ke=limit_ke,
                            limit_kd=limit_kd, armature=armature,
                            effort_limit=effort_limit,
                            velocity_limit=velocity_limit, friction=friction)
        return self.add_joint(JointType.REVOLUTE, parent, child,
                              angular_axes=[cfg], xform_p=xform_p, xform_c=xform_c,
                              key=key, collision_filter_parent=collision_filter_parent,
                              enabled=enabled)

    def add_joint_prismatic(
        self, parent: int, child: int, axis: AxisType = Axis.X,
        xform_p: Optional[Transform] = None, xform_c: Optional[Transform] = None,
        target: Optional[float] = None, target_ke: Optional[float] = None,
        target_kd: Optional[float] = None, limit_lower: Optional[float] = None,
        limit_upper: Optional[float] = None, limit_ke: Optional[float] = None,
        limit_kd: Optional[float] = None, armature: Optional[float] = None,
        effort_limit: Optional[float] = None, velocity_limit: Optional[float] = None,
        friction: Optional[float] = None, key: Optional[str] = None,
        collision_filter_parent: bool = True, enabled: bool = True,
    ) -> int:
        """Prismatic (slider) joint (reference: builder.py:4476)."""
        cfg = self._dof_cfg(axis, target=target, target_ke=target_ke,
                            target_kd=target_kd, limit_lower=limit_lower,
                            limit_upper=limit_upper, limit_ke=limit_ke,
                            limit_kd=limit_kd, armature=armature,
                            effort_limit=effort_limit,
                            velocity_limit=velocity_limit, friction=friction)
        return self.add_joint(JointType.PRISMATIC, parent, child,
                              linear_axes=[cfg], xform_p=xform_p, xform_c=xform_c,
                              key=key, collision_filter_parent=collision_filter_parent,
                              enabled=enabled)

    def add_joint_ball(self, parent: int, child: int,
                       xform_p: Optional[Transform] = None,
                       xform_c: Optional[Transform] = None,
                       armature: Optional[float] = None,
                       key: Optional[str] = None,
                       collision_filter_parent: bool = True,
                       enabled: bool = True) -> int:
        """Ball (spherical) joint (reference: builder.py:4538)."""
        cfg = self._dof_cfg(Axis.X, armature=armature)
        return self.add_joint(JointType.BALL, parent, child, angular_axes=[cfg],
                              xform_p=xform_p, xform_c=xform_c, key=key,
                              collision_filter_parent=collision_filter_parent,
                              enabled=enabled)

    def add_joint_fixed(self, parent: int, child: int,
                        xform_p: Optional[Transform] = None,
                        xform_c: Optional[Transform] = None,
                        key: Optional[str] = None,
                        collision_filter_parent: bool = True,
                        enabled: bool = True) -> int:
        """Fixed (weld) joint (reference: builder.py:4590)."""
        return self.add_joint(JointType.FIXED, parent, child,
                              xform_p=xform_p, xform_c=xform_c, key=key,
                              collision_filter_parent=collision_filter_parent,
                              enabled=enabled)

    def add_joint_free(self, child: int, parent: int = -1,
                       xform_p: Optional[Transform] = None,
                       xform_c: Optional[Transform] = None,
                       armature: Optional[float] = None,
                       key: Optional[str] = None,
                       collision_filter_parent: bool = True,
                       enabled: bool = True) -> int:
        """Free (floating-base) joint (reference: builder.py:4640)."""
        cfg = self._dof_cfg(Axis.X, armature=armature if armature is not None else 0.0)
        return self.add_joint(JointType.FREE, parent, child, angular_axes=[cfg],
                              xform_p=xform_p, xform_c=xform_c, key=key,
                              collision_filter_parent=collision_filter_parent,
                              enabled=enabled)

    def add_joint_distance(self, parent: int, child: int,
                           min_distance: float = -1.0, max_distance: float = 1.0,
                           xform_p: Optional[Transform] = None,
                           xform_c: Optional[Transform] = None,
                           key: Optional[str] = None,
                           collision_filter_parent: bool = True,
                           enabled: bool = True) -> int:
        """Distance joint (reference: builder.py:4700)."""
        cfg = self.default_joint_cfg.copy()
        cfg.limit_lower = float(min_distance)
        cfg.limit_upper = float(max_distance)
        return self.add_joint(JointType.DISTANCE, parent, child,
                              linear_axes=[cfg], xform_p=xform_p, xform_c=xform_c,
                              key=key, collision_filter_parent=collision_filter_parent,
                              enabled=enabled)

    def add_joint_d6(self, parent: int, child: int,
                     linear_axes: Optional[Sequence[JointDofConfig]] = None,
                     angular_axes: Optional[Sequence[JointDofConfig]] = None,
                     xform_p: Optional[Transform] = None,
                     xform_c: Optional[Transform] = None,
                     key: Optional[str] = None,
                     collision_filter_parent: bool = True,
                     enabled: bool = True) -> int:
        """Generic D6 joint with explicit dof axes (reference: builder.py:4925)."""
        return self.add_joint(JointType.D6, parent, child,
                              linear_axes=linear_axes, angular_axes=angular_axes,
                              xform_p=xform_p, xform_c=xform_c, key=key,
                              collision_filter_parent=collision_filter_parent,
                              enabled=enabled)

    def add_joint_cable(self, parent: int, child: int,
                        xform_p: Optional[Transform] = None,
                        xform_c: Optional[Transform] = None,
                        stretch_stiffness: float = 1.0e5,
                        stretch_damping: float = 0.0,
                        shear_stiffness: Optional[float] = None,
                        shear_damping: Optional[float] = None,
                        bend_stiffness: float = 0.0,
                        bend_damping: float = 0.0,
                        twist_stiffness: Optional[float] = None,
                        twist_damping: Optional[float] = None,
                        key: Optional[str] = None,
                        collision_filter_parent: bool = True,
                        enabled: bool = True) -> int:
        """Cable (Cosserat rod) joint with split stretch/shear and bend/twist
        stiffness (reference: builder.py:5166 add_joint_cable).

        Each anchor frame's local ``+Z`` is the material tangent: stretch acts
        along the parent tangent, shear transverse to it, twist about it, and
        bend across it. For a chained rod, the parent anchor ``+Z`` should
        point from the parent attachment toward the child attachment
        (:meth:`add_rod` satisfies this automatically). Stiffness/damping is
        stored per dof in ``joint_target_ke``/``joint_target_kd`` in the
        order [shear_x, shear_y, stretch_z, bend_x, bend_y, twist_z]. Cables
        carry no ``joint_q`` coordinates — segment transforms are integrated
        directly by the maximal-coordinate solvers (SolverXPBD / SolverVBD).
        """
        if shear_stiffness is None and shear_damping is None:
            shear_stiffness, shear_damping = stretch_stiffness, stretch_damping
        shear_stiffness = stretch_stiffness if shear_stiffness is None else shear_stiffness
        shear_damping = 0.0 if shear_damping is None else shear_damping
        if twist_stiffness is None and twist_damping is None:
            twist_stiffness, twist_damping = bend_stiffness, bend_damping
        twist_stiffness = bend_stiffness if twist_stiffness is None else twist_stiffness
        twist_damping = 0.0 if twist_damping is None else twist_damping

        def cfg(axis, ke, kd):
            return JointDofConfig(axis=axis, target_ke=float(ke),
                                  target_kd=float(kd), armature=0.0)

        lin = [cfg(Axis.X, shear_stiffness, shear_damping),
               cfg(Axis.Y, shear_stiffness, shear_damping),
               cfg(Axis.Z, stretch_stiffness, stretch_damping)]
        ang = [cfg(Axis.X, bend_stiffness, bend_damping),
               cfg(Axis.Y, bend_stiffness, bend_damping),
               cfg(Axis.Z, twist_stiffness, twist_damping)]
        return self.add_joint(JointType.CABLE, parent, child,
                              linear_axes=lin, angular_axes=ang,
                              xform_p=xform_p, xform_c=xform_c, key=key,
                              collision_filter_parent=collision_filter_parent,
                              enabled=enabled)

    def _filter_body_pair(self, body_a: int, body_b: int):
        """Disable collision between every shape of two bodies."""
        shapes_a = [s for s, b in enumerate(self.shape_body) if b == body_a]
        shapes_b = [s for s, b in enumerate(self.shape_body) if b == body_b]
        for sa in shapes_a:
            for sb in shapes_b:
                self.shape_collision_filter_pairs.add((min(sa, sb), max(sa, sb)))
        # also record a body-level filter applied to shapes added later
        self._body_filter_pairs.add((min(body_a, body_b), max(body_a, body_b)))

    # body-level collision filters (applied lazily in finalize for shapes
    # added after the joint)
    @property
    def _body_filter_pairs(self) -> Set[Tuple[int, int]]:
        if not hasattr(self, "_body_filter_pairs_"):
            self._body_filter_pairs_: Set[Tuple[int, int]] = set()
        return self._body_filter_pairs_

    # ------------------------------------------------------------------
    # shapes (reference: builder.py:6339-7212)
    # ------------------------------------------------------------------
    def add_shape(
        self,
        body: int,
        geo_type: GeoType,
        xform: Optional[Transform] = None,
        scale: Vec3 = (1.0, 1.0, 1.0),
        cfg: Optional[ShapeConfig] = None,
        source: Any = None,
        key: Optional[str] = None,
    ) -> int:
        """Add a collision/visual shape attached to ``body`` (-1 = static)."""
        cfg = cfg or self.default_shape_cfg
        idx = self.shape_count
        self.shape_transform.append(_as_transform(xform))
        self.shape_body.append(int(body))
        self.shape_type.append(int(geo_type))
        self.shape_scale.append(np.asarray(scale, dtype=np.float64))
        self.shape_flags.append(cfg.flags)
        self.shape_thickness.append(float(cfg.thickness))
        self.shape_material_mu.append(float(cfg.mu))
        self.shape_material_restitution.append(float(cfg.restitution))
        self.shape_material_ke.append(float(cfg.ke))
        self.shape_material_kd.append(float(cfg.kd))
        self.shape_material_kf.append(float(cfg.kf))
        self.shape_material_kh.append(float(cfg.kh))
        self.shape_collision_group.append(int(cfg.collision_group))
        self.shape_contype.append(int(getattr(cfg, "contype", 1)))
        self.shape_conaffinity.append(int(getattr(cfg, "conaffinity", 1)))
        w = self.body_world[body] if body >= 0 else self._current_world
        self.shape_world.append(w)
        self.shape_source.append(source)
        self.shape_sdf_resolution.append(
            int(getattr(cfg, "sdf_max_resolution", 0)))
        self.shape_key.append(key or f"shape_{idx}")

        # accumulate body mass/inertia from density
        if body >= 0 and cfg.density > 0.0 and not cfg.is_site:
            m, c, I = self._shape_mass(geo_type, self.shape_scale[idx], source,
                                       cfg.density, cfg.is_solid,
                                       cfg.thickness)
            if m > 0.0:
                self._update_body_mass(body, m, I, c, self.shape_transform[idx])
        return idx

    def _shape_mass(self, geo_type, scale, source, density, is_solid, thickness):
        g = GeoType(geo_type)
        if g == GeoType.SPHERE:
            return compute_sphere_inertia(density, scale[0])
        if g == GeoType.BOX:
            return compute_box_inertia(density, scale[0], scale[1], scale[2])
        if g == GeoType.CAPSULE:
            return compute_capsule_inertia(density, scale[0], scale[1])
        if g == GeoType.CYLINDER:
            return compute_cylinder_inertia(density, scale[0], scale[1])
        if g == GeoType.CONE:
            return compute_cone_inertia(density, scale[0], scale[1])
        if g == GeoType.ELLIPSOID:
            return compute_ellipsoid_inertia(density, scale[0], scale[1], scale[2])
        if g in (GeoType.MESH, GeoType.CONVEX) and source is not None:
            if not source.has_inertia:
                return 0.0, np.zeros(3), np.zeros((3, 3))
            s3 = float(scale[0] * scale[1] * scale[2])
            m = source.mass * density * s3
            c = source.com * np.asarray(scale)
            I = source.inertia * density * s3 * float(np.mean(np.asarray(scale) ** 2))
            return m, c, I
        return 0.0, np.zeros(3), np.zeros((3, 3))

    def _update_body_mass(self, body: int, m: float, I: np.ndarray,
                          com: np.ndarray, shape_xform: np.ndarray):
        """Accumulate a shape's mass properties into its body (parallel-axis)."""
        # shape COM and inertia (about the shape COM) rotated into body axes;
        # the single parallel-axis shift to the combined COM happens below —
        # shifting here too would double-count m d^2 (caught by the MuJoCo-C
        # mass-matrix parity gate, tests/test_parity_mujoco.py)
        p_com = np_transform_point(shape_xform, com)
        R = np.asarray(
            [np_transform_vector(shape_xform, e) for e in np.eye(3)]
        ).T
        I_body = R @ I @ R.T

        m0 = self.body_mass[body]
        c0 = self.body_com[body]
        I0 = self.body_inertia[body]
        m1 = m0 + m
        c1 = (m0 * c0 + m * p_com) / m1
        # shift both inertias to the combined COM
        I0s = transform_inertia(m0, I0, c0 - c1, np.array([0.0, 0.0, 0.0, 1.0]))
        I1s = transform_inertia(m, I_body, p_com - c1, np.array([0.0, 0.0, 0.0, 1.0]))
        self.body_mass[body] = m1
        self.body_com[body] = c1
        self.body_inertia[body] = I0s + I1s

    def add_shape_plane(self, body: int = -1, xform: Optional[Transform] = None,
                        width: float = 10.0, length: float = 10.0,
                        cfg: Optional[ShapeConfig] = None,
                        key: Optional[str] = None) -> int:
        """Plane with +Z normal in shape frame (reference: builder.py:6440)."""
        return self.add_shape(body, GeoType.PLANE, xform,
                              scale=(width, length, 0.0), cfg=cfg, key=key)

    def add_ground_plane(self, cfg: Optional[ShapeConfig] = None,
                         key: Optional[str] = None) -> int:
        """Infinite ground plane normal to the up axis (reference: builder.py:6499)."""
        # rotate shape +Z onto the builder's up axis
        q = np_quat_between_axes(np.array([0.0, 0.0, 1.0]), self.up_vector)
        return self.add_shape(-1, GeoType.PLANE, np_transform(q=q),
                              scale=(0.0, 0.0, 0.0), cfg=cfg,
                              key=key or "ground_plane")

    def add_shape_sphere(self, body: int, xform: Optional[Transform] = None,
                         radius: float = 1.0, cfg: Optional[ShapeConfig] = None,
                         key: Optional[str] = None) -> int:
        return self.add_shape(body, GeoType.SPHERE, xform,
                              scale=(radius, radius, radius), cfg=cfg, key=key)

    def add_shape_box(self, body: int, xform: Optional[Transform] = None,
                      hx: float = 0.5, hy: float = 0.5, hz: float = 0.5,
                      cfg: Optional[ShapeConfig] = None,
                      key: Optional[str] = None) -> int:
        return self.add_shape(body, GeoType.BOX, xform, scale=(hx, hy, hz),
                              cfg=cfg, key=key)

    def add_shape_capsule(self, body: int, xform: Optional[Transform] = None,
                          radius: float = 1.0, half_height: float = 0.5,
                          axis: AxisType = Axis.Z,
                          cfg: Optional[ShapeConfig] = None,
                          key: Optional[str] = None) -> int:
        """Capsule along +Z in shape frame; ``axis`` rotates the shape frame."""
        xf = self._axis_shape_xform(xform, axis)
        return self.add_shape(body, GeoType.CAPSULE, xf,
                              scale=(radius, half_height, 0.0), cfg=cfg, key=key)

    def add_shape_cylinder(self, body: int, xform: Optional[Transform] = None,
                           radius: float = 1.0, half_height: float = 0.5,
                           axis: AxisType = Axis.Z,
                           cfg: Optional[ShapeConfig] = None,
                           key: Optional[str] = None) -> int:
        xf = self._axis_shape_xform(xform, axis)
        return self.add_shape(body, GeoType.CYLINDER, xf,
                              scale=(radius, half_height, 0.0), cfg=cfg, key=key)

    def add_shape_cone(self, body: int, xform: Optional[Transform] = None,
                       radius: float = 1.0, half_height: float = 0.5,
                       axis: AxisType = Axis.Z,
                       cfg: Optional[ShapeConfig] = None,
                       key: Optional[str] = None) -> int:
        xf = self._axis_shape_xform(xform, axis)
        return self.add_shape(body, GeoType.CONE, xf,
                              scale=(radius, half_height, 0.0), cfg=cfg, key=key)

    def add_shape_ellipsoid(self, body: int, xform: Optional[Transform] = None,
                            rx: float = 1.0, ry: float = 1.0, rz: float = 1.0,
                            cfg: Optional[ShapeConfig] = None,
                            key: Optional[str] = None) -> int:
        return self.add_shape(body, GeoType.ELLIPSOID, xform, scale=(rx, ry, rz),
                              cfg=cfg, key=key)

    def add_shape_mesh(self, body: int, xform: Optional[Transform] = None,
                       mesh: Optional[Mesh] = None, scale: Vec3 = (1.0, 1.0, 1.0),
                       cfg: Optional[ShapeConfig] = None,
                       key: Optional[str] = None) -> int:
        if mesh is None:
            raise ValueError("add_shape_mesh requires a Mesh source")
        return self.add_shape(body, GeoType.MESH, xform, scale=scale, cfg=cfg,
                              source=mesh, key=key)

    def add_shape_convex_hull(self, body: int, xform: Optional[Transform] = None,
                              mesh: Optional[Mesh] = None,
                              scale: Vec3 = (1.0, 1.0, 1.0),
                              cfg: Optional[ShapeConfig] = None,
                              key: Optional[str] = None) -> int:
        """Convex hull of a mesh (reference: builder.py:7049). The hull is
        computed on the host; collision treats it as a convex point cloud."""
        if mesh is None:
            raise ValueError("add_shape_convex_hull requires a Mesh source")
        hull = _convex_hull_mesh(mesh)
        return self.add_shape(body, GeoType.CONVEX, xform, scale=scale, cfg=cfg,
                              source=hull, key=key)

    def add_shape_sdf(self, body: int, xform: Optional[Transform] = None,
                      sdf: Optional[SDF] = None, scale: Vec3 = (1.0, 1.0, 1.0),
                      cfg: Optional[ShapeConfig] = None,
                      key: Optional[str] = None) -> int:
        return self.add_shape(body, GeoType.SDF, xform, scale=scale, cfg=cfg,
                              source=sdf, key=key)

    def add_shape_heightfield(self, body: int = -1,
                              xform: Optional[Transform] = None,
                              heightfield: Optional[Heightfield] = None,
                              cfg: Optional[ShapeConfig] = None,
                              key: Optional[str] = None) -> int:
        if heightfield is None:
            raise ValueError("add_shape_heightfield requires a Heightfield source")
        return self.add_shape(body, GeoType.HFIELD, xform,
                              scale=(heightfield.size_x, heightfield.size_y, 1.0),
                              cfg=cfg, source=heightfield, key=key)

    def add_site(self, body: int, xform: Optional[Transform] = None,
                 key: Optional[str] = None,
                 cfg: Optional[ShapeConfig] = None) -> int:
        """Massless non-colliding frame marker (reference: builder.py:7213)."""
        cfg = cfg or self.default_site_cfg
        return self.add_shape(body, GeoType.NONE, xform, cfg=cfg, key=key)

    def add_shape_gaussian(self, body: int, xform: Optional[Transform] = None,
                           means=None, scales=None, quats=None, colors=None,
                           opacities=None, key: Optional[str] = None) -> int:
        """Gaussian-splat cloud attached to a body — visual only, never
        collides (reference: geometry/types.py:2334 Gaussian,
        builder add_shape_gaussian). Rendered by viewers via
        ``log_gaussian`` and by the tiled camera's splat channel."""
        import numpy as _np
        cfg = self.default_site_cfg.copy()   # massless, non-colliding
        splat = {
            "means": _np.asarray(means if means is not None
                                 else _np.zeros((0, 3)), dtype=_np.float64),
            "scales": _np.asarray(scales if scales is not None
                                  else _np.full((0, 3), 0.01)),
            "quats": _np.asarray(quats if quats is not None
                                 else _np.tile([0.0, 0, 0, 1],
                                               (0, 1))),
            "colors": colors, "opacities": opacities,
        }
        return self.add_shape(body, GeoType.GAUSSIAN, xform, cfg=cfg,
                              source=splat, key=key)

    def _axis_shape_xform(self, xform: Optional[Transform], axis: AxisType) -> np.ndarray:
        base = _as_transform(xform)
        a = axis_to_vec3(axis)
        q = np_quat_between_axes(np.array([0.0, 0.0, 1.0]), a)
        return np_transform_multiply(base, np_transform(q=q))

    # ------------------------------------------------------------------
    # particles / springs / cloth / soft bodies (reference: builder.py:8931-9600)
    # ------------------------------------------------------------------
    def add_particle(self, pos: Vec3, vel: Vec3 = (0.0, 0.0, 0.0),
                     mass: float = 1.0, radius: float = 0.1,
                     flags: int = int(ParticleFlags.ACTIVE)) -> int:
        idx = self.particle_count
        self.particle_q.append(np.asarray(pos, dtype=np.float64))
        self.particle_qd.append(np.asarray(vel, dtype=np.float64))
        self.particle_mass.append(float(mass))
        self.particle_radius.append(float(radius))
        self.particle_flags.append(int(flags))
        self.particle_world.append(self._current_world)
        return idx

    def add_particles(self, pos, vel=None, mass=None, radius=None,
                      flags=None) -> List[int]:
        pos = np.asarray(pos, dtype=np.float64).reshape(-1, 3)
        n = len(pos)
        vel = np.zeros((n, 3)) if vel is None else np.asarray(vel, dtype=np.float64).reshape(-1, 3)
        mass = np.ones(n) if mass is None else np.broadcast_to(np.asarray(mass, dtype=np.float64), (n,))
        radius = np.full(n, 0.1) if radius is None else np.broadcast_to(np.asarray(radius, dtype=np.float64), (n,))
        flags = np.full(n, int(ParticleFlags.ACTIVE), dtype=np.int64) if flags is None else np.broadcast_to(np.asarray(flags, dtype=np.int64), (n,))
        start = self.particle_count
        self.particle_q.extend(list(pos))
        self.particle_qd.extend(list(vel))
        self.particle_mass.extend([float(m) for m in mass])
        self.particle_radius.extend([float(r) for r in radius])
        self.particle_flags.extend([int(f) for f in flags])
        self.particle_world.extend([self._current_world] * n)
        return list(range(start, start + n))

    def add_spring(self, i: int, j: int, ke: float = 1.0e3, kd: float = 0.0,
                   control: float = 1.0) -> int:
        rest = float(np.linalg.norm(self.particle_q[i] - self.particle_q[j])) * control
        self.spring_indices.append((i, j))
        self.spring_rest_length.append(rest)
        self.spring_stiffness.append(float(ke))
        self.spring_damping.append(float(kd))
        return len(self.spring_indices) - 1

    def sew_particles(self, indices_a, indices_b, ke: float = 2.0e3,
                      kd: float = 1.0, shrink: float = 0.0) -> List[int]:
        """Sewing lines between two cloth panels (reference: the Style3D
        builder's garment seam assembly, style3d/builder.py): zero-or-short
        rest-length springs pulling paired vertices together. ``shrink``
        in [0, 1) scales the rest length below the current separation
        (1.0-shrink factor); 0.0 keeps the panels where they are and lets
        the solver drape them, while values near 1 cinch the seam closed.
        Returns the spring indices."""
        out = []
        for a, b in zip(indices_a, indices_b):
            s = self.add_spring(int(a), int(b), ke=ke, kd=kd,
                                control=max(1.0 - float(shrink), 0.0))
            out.append(s)
        return out

    def add_triangle(self, i: int, j: int, k: int,
                     tri_ke: float = 100.0, tri_ka: float = 100.0,
                     tri_kd: float = 10.0, tri_drag: float = 0.0,
                     tri_lift: float = 0.0) -> float:
        """Add an FEM surface triangle; returns its rest area
        (reference: builder.py:8530). The 2x2 inverse rest matrix follows the
        standard co-rotational membrane formulation."""
        p, q, r = self.particle_q[i], self.particle_q[j], self.particle_q[k]
        qp, rp = q - p, r - p
        n = np.cross(qp, rp)
        area = 0.5 * float(np.linalg.norm(n))
        if area < 1e-12:
            raise ValueError("Degenerate triangle")
        # local 2D basis in the triangle plane
        e1 = qp / np.linalg.norm(qp)
        nrm = n / (2.0 * area)
        e2 = np.cross(nrm, e1)
        D = np.array([[qp @ e1, rp @ e1], [qp @ e2, rp @ e2]])
        self.tri_indices.append((i, j, k))
        self.tri_poses.append(np.linalg.inv(D))
        self.tri_materials.append((tri_ke, tri_ka, tri_kd, tri_drag, tri_lift))
        self.tri_areas.append(area)
        return area

    def add_triangles(self, indices, **kwargs) -> List[float]:
        return [self.add_triangle(int(a), int(b), int(c), **kwargs)
                for a, b, c in np.asarray(indices).reshape(-1, 3)]

    def add_edge(self, i: int, j: int, k: int, l: int,
                 rest: Optional[float] = None,
                 edge_ke: float = 100.0, edge_kd: float = 0.0) -> int:
        """Bending edge between triangles (i,k,l) and (j,l,k)
        (reference: builder.py:8700): o0=i, o1=j opposite vertices, shared
        edge (k,l); rest angle computed from initial configuration."""
        if rest is None:
            if i >= 0 and j >= 0:
                x1, x2 = self.particle_q[k], self.particle_q[l]
                x3, x4 = self.particle_q[i], self.particle_q[j]
                e = x2 - x1
                e_norm = np.linalg.norm(e)
                n1 = np.cross(x3 - x1, x2 - x1)
                n2 = np.cross(x2 - x1, x4 - x1)
                if e_norm > 1e-12 and np.linalg.norm(n1) > 1e-12 and np.linalg.norm(n2) > 1e-12:
                    n1 /= np.linalg.norm(n1)
                    n2 /= np.linalg.norm(n2)
                    cos_t = float(np.clip(n1 @ n2, -1.0, 1.0))
                    sin_t = float(np.clip(np.cross(n1, n2) @ (e / e_norm), -1.0, 1.0))
                    rest = math.atan2(sin_t, cos_t)
                else:
                    rest = 0.0
            else:
                rest = 0.0
        self.edge_indices.append((i, j, k, l))
        self.edge_rest_angle.append(float(rest))
        self.edge_rest_length.append(float(np.linalg.norm(self.particle_q[l] - self.particle_q[k])))
        self.edge_bending_properties.append((edge_ke, edge_kd))
        return len(self.edge_indices) - 1

    def add_edges(self, indices, **kwargs) -> List[int]:
        return [self.add_edge(int(a), int(b), int(c), int(d), **kwargs)
                for a, b, c, d in np.asarray(indices).reshape(-1, 4)]

    def add_tetrahedron(self, i: int, j: int, k: int, l: int,
                        k_mu: float = 1.0e3, k_lambda: float = 1.0e3,
                        k_damp: float = 0.0) -> float:
        """Add an FEM tetrahedron; returns rest volume (reference: builder.py:8800)."""
        p, q, r, s = (self.particle_q[x] for x in (i, j, k, l))
        D = np.stack([q - p, r - p, s - p], axis=1)
        vol = float(np.linalg.det(D)) / 6.0
        if vol <= 0.0:
            raise ValueError("Inverted or degenerate tetrahedron")
        self.tet_indices.append((i, j, k, l))
        self.tet_poses.append(np.linalg.inv(D))
        self.tet_materials.append((k_mu, k_lambda, k_damp))
        return vol

    def add_cloth_grid(self, pos: Vec3, rot=None, vel: Vec3 = (0, 0, 0),
                       dim_x: int = 10, dim_y: int = 10,
                       cell_x: float = 0.1, cell_y: float = 0.1,
                       mass: float = 1.0, fix_left: bool = False,
                       fix_right: bool = False, fix_top: bool = False,
                       fix_bottom: bool = False, radius: float = 0.05,
                       tri_ke: float = 100.0, tri_ka: float = 100.0,
                       tri_kd: float = 10.0, edge_ke: float = 100.0,
                       edge_kd: float = 0.0,
                       add_springs: bool = False,
                       spring_ke: float = 100.0, spring_kd: float = 0.0) -> List[int]:
        """Regular cloth grid in the shape-frame XY plane
        (reference: builder.py:9058)."""
        rot = np_quat_identity() if rot is None else np.asarray(rot, dtype=np.float64)
        pos = np.asarray(pos, dtype=np.float64)
        vel = np.asarray(vel, dtype=np.float64)
        nx, ny = dim_x + 1, dim_y + 1
        start = self.particle_count
        pm = mass / (nx * ny)
        idx = np.arange(nx * ny).reshape(ny, nx)
        for yi in range(ny):
            for xi in range(nx):
                local = np.array([xi * cell_x, yi * cell_y, 0.0])
                p = pos + np_quat_rotate(rot, local)
                fixed = ((fix_left and xi == 0) or (fix_right and xi == nx - 1)
                         or (fix_bottom and yi == 0) or (fix_top and yi == ny - 1))
                self.add_particle(p, vel, 0.0 if fixed else pm, radius=radius)
        tri_kwargs = dict(tri_ke=tri_ke, tri_ka=tri_ka, tri_kd=tri_kd)
        for yi in range(dim_y):
            for xi in range(dim_x):
                v0 = start + idx[yi, xi]
                v1 = start + idx[yi, xi + 1]
                v2 = start + idx[yi + 1, xi]
                v3 = start + idx[yi + 1, xi + 1]
                if (xi + yi) % 2 == 0:
                    self.add_triangle(v0, v1, v3, **tri_kwargs)
                    self.add_triangle(v0, v3, v2, **tri_kwargs)
                else:
                    self.add_triangle(v0, v1, v2, **tri_kwargs)
                    self.add_triangle(v1, v3, v2, **tri_kwargs)
        self._add_grid_bend_edges(start, idx, edge_ke, edge_kd)
        if add_springs:
            for yi in range(ny):
                for xi in range(nx):
                    if xi < dim_x:
                        self.add_spring(start + idx[yi, xi], start + idx[yi, xi + 1], spring_ke, spring_kd)
                    if yi < dim_y:
                        self.add_spring(start + idx[yi, xi], start + idx[yi + 1, xi], spring_ke, spring_kd)
        return list(range(start, self.particle_count))

    def _add_grid_bend_edges(self, start, idx, edge_ke, edge_kd):
        ny, nx = idx.shape
        for yi in range(ny):
            for xi in range(nx - 2):
                self.add_edge(start + idx[yi, xi], start + idx[yi, xi + 2],
                              start + idx[yi, xi + 1], start + idx[yi, xi + 1],
                              rest=0.0, edge_ke=edge_ke, edge_kd=edge_kd)
        for xi in range(nx):
            for yi in range(ny - 2):
                self.add_edge(start + idx[yi, xi], start + idx[yi + 2, xi],
                              start + idx[yi + 1, xi], start + idx[yi + 1, xi],
                              rest=0.0, edge_ke=edge_ke, edge_kd=edge_kd)

    def add_cloth_mesh(self, pos: Vec3, rot, vel: Vec3, vertices, indices,
                       density: float = 1.0, scale: float = 1.0,
                       radius: float = 0.05,
                       tri_ke: float = 100.0, tri_ka: float = 100.0,
                       tri_kd: float = 10.0, edge_ke: float = 100.0,
                       edge_kd: float = 0.0) -> List[int]:
        """Cloth from an arbitrary triangle mesh (reference: builder.py:8931)."""
        rot = np_quat_identity() if rot is None else np.asarray(rot, dtype=np.float64)
        pos = np.asarray(pos, dtype=np.float64)
        vel = np.asarray(vel, dtype=np.float64)
        verts = np.asarray(vertices, dtype=np.float64).reshape(-1, 3) * scale
        faces = np.asarray(indices, dtype=np.int64).reshape(-1, 3)
        start = self.particle_count
        for v in verts:
            self.add_particle(pos + np_quat_rotate(rot, v), vel, 0.0, radius=radius)
        areas = self.add_triangles(faces + start, tri_ke=tri_ke, tri_ka=tri_ka, tri_kd=tri_kd)
        # lump mass from triangle areas
        for (a, b, c), ar in zip(faces + start, areas):
            m = density * ar / 3.0
            for vtx in (a, b, c):
                self.particle_mass[vtx] += m
        # bending edges from shared mesh edges
        edge_map: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
        for t, (a, b, c) in enumerate(faces + start):
            for (u, v), opp in (((a, b), c), ((b, c), a), ((c, a), b)):
                kkey = (min(u, v), max(u, v))
                edge_map.setdefault(kkey, []).append((opp, t))
        for (u, v), opps in edge_map.items():
            if len(opps) == 2:
                self.add_edge(opps[0][0], opps[1][0], u, v,
                              edge_ke=edge_ke, edge_kd=edge_kd)
        return list(range(start, self.particle_count))

    def add_particle_grid(self, pos: Vec3, rot=None, vel: Vec3 = (0, 0, 0),
                          dim_x: int = 4, dim_y: int = 4, dim_z: int = 4,
                          cell_x: float = 0.1, cell_y: float = 0.1,
                          cell_z: float = 0.1, mass: float = 1.0,
                          radius: float = 0.05, jitter: float = 0.0,
                          seed: int = 42) -> List[int]:
        """Regular 3D particle grid (reference: builder.py:9208)."""
        rot = np_quat_identity() if rot is None else np.asarray(rot, dtype=np.float64)
        pos = np.asarray(pos, dtype=np.float64)
        rng = np.random.default_rng(seed)
        start = self.particle_count
        for zi in range(dim_z):
            for yi in range(dim_y):
                for xi in range(dim_x):
                    local = np.array([xi * cell_x, yi * cell_y, zi * cell_z])
                    if jitter > 0.0:
                        local = local + rng.uniform(-jitter, jitter, 3)
                    self.add_particle(pos + np_quat_rotate(rot, local),
                                      vel, mass, radius=radius)
        return list(range(start, self.particle_count))

    def add_soft_grid(self, pos: Vec3, rot, vel: Vec3,
                      dim_x: int, dim_y: int, dim_z: int,
                      cell_x: float, cell_y: float, cell_z: float,
                      density: float = 100.0,
                      k_mu: float = 1.0e3, k_lambda: float = 1.0e3,
                      k_damp: float = 0.0, radius: float = 0.05,
                      fix_left: bool = False, fix_right: bool = False,
                      fix_top: bool = False, fix_bottom: bool = False,
                      tri_ke: float = 0.0, tri_ka: float = 0.0,
                      tri_kd: float = 0.0) -> List[int]:
        """Hexahedral soft-body grid split into 5 tets per cell
        (reference: builder.py:9312)."""
        rot = np_quat_identity() if rot is None else np.asarray(rot, dtype=np.float64)
        pos = np.asarray(pos, dtype=np.float64)
        vel = np.asarray(vel, dtype=np.float64)
        nx, ny, nz = dim_x + 1, dim_y + 1, dim_z + 1
        start = self.particle_count
        cell_vol = cell_x * cell_y * cell_z
        pm = density * cell_vol * dim_x * dim_y * dim_z / (nx * ny * nz)

        def vidx(xi, yi, zi):
            return start + zi * nx * ny + yi * nx + xi

        for zi in range(nz):
            for yi in range(ny):
                for xi in range(nx):
                    local = np.array([xi * cell_x, yi * cell_y, zi * cell_z])
                    fixed = ((fix_left and xi == 0) or (fix_right and xi == nx - 1)
                             or (fix_bottom and zi == 0) or (fix_top and zi == nz - 1))
                    self.add_particle(pos + np_quat_rotate(rot, local), vel,
                                      0.0 if fixed else pm, radius=radius)
        # 5-tet decomposition, alternating parity to keep faces conforming
        for zi in range(dim_z):
            for yi in range(dim_y):
                for xi in range(dim_x):
                    v = [vidx(xi, yi, zi), vidx(xi + 1, yi, zi),
                         vidx(xi + 1, yi + 1, zi), vidx(xi, yi + 1, zi),
                         vidx(xi, yi, zi + 1), vidx(xi + 1, yi, zi + 1),
                         vidx(xi + 1, yi + 1, zi + 1), vidx(xi, yi + 1, zi + 1)]
                    if (xi + yi + zi) % 2 == 0:
                        tets = [(0, 1, 2, 5), (0, 2, 7, 5), (0, 2, 3, 7),
                                (0, 5, 7, 4), (2, 7, 5, 6)]
                    else:
                        tets = [(1, 3, 0, 4), (1, 6, 3, 4)[:], (1, 2, 3, 6),
                                (3, 6, 4, 7), (1, 4, 6, 5)]
                    for a, b, c, d in tets:
                        try:
                            self.add_tetrahedron(v[a], v[b], v[c], v[d],
                                                 k_mu, k_lambda, k_damp)
                        except ValueError:
                            # flip orientation if the parity produced an inverted tet
                            self.add_tetrahedron(v[a], v[c], v[b], v[d],
                                                 k_mu, k_lambda, k_damp)
        return list(range(start, self.particle_count))

    def add_soft_mesh(self, pos: Vec3, rot, vel: Vec3, vertices, indices,
                      density: float = 100.0, scale: float = 1.0,
                      k_mu: float = 1.0e3, k_lambda: float = 1.0e3,
                      k_damp: float = 0.0, radius: float = 0.05,
                      tri_ke: float = 0.0, tri_ka: float = 0.0,
                      tri_kd: float = 0.0) -> List[int]:
        """Soft body from a tetrahedral mesh: ``indices`` is (T, 4)
        (reference: builder.py:9484)."""
        rot = np_quat_identity() if rot is None else np.asarray(rot, dtype=np.float64)
        pos = np.asarray(pos, dtype=np.float64)
        vel = np.asarray(vel, dtype=np.float64)
        verts = np.asarray(vertices, dtype=np.float64).reshape(-1, 3) * scale
        tets = np.asarray(indices, dtype=np.int64).reshape(-1, 4)
        start = self.particle_count
        for v in verts:
            self.add_particle(pos + np_quat_rotate(rot, v), vel, 0.0, radius=radius)
        for a, b, c, d in tets + start:
            try:
                vol = self.add_tetrahedron(int(a), int(b), int(c), int(d),
                                           k_mu, k_lambda, k_damp)
            except ValueError:
                vol = self.add_tetrahedron(int(a), int(c), int(b), int(d),
                                           k_mu, k_lambda, k_damp)
            m = density * vol / 4.0
            for vtx in (a, b, c, d):
                self.particle_mass[int(vtx)] += m
        # surface triangles: faces appearing exactly once across tets
        face_count: Dict[Tuple[int, int, int], Tuple[int, int, int]] = {}
        for a, b, c, d in tets + start:
            for f in ((a, c, b), (a, b, d), (a, d, c), (b, c, d)):
                kkey = tuple(sorted(int(x) for x in f))
                if kkey in face_count:
                    del face_count[kkey]
                else:
                    face_count[kkey] = tuple(int(x) for x in f)
        for f in face_count.values():
            try:
                self.add_triangle(f[0], f[1], f[2], tri_ke, tri_ka, tri_kd)
            except ValueError:
                pass
        return list(range(start, self.particle_count))

    # ------------------------------------------------------------------
    # equality constraints (reference: builder.py:5292 + solvers/mujoco/equality.py)
    # ------------------------------------------------------------------
    def add_muscle(self, bodies: Sequence[int], positions: Sequence[Vec3],
                   f0: float, lm: float, lt: float, lmax: float,
                   pen: float, passive_ke: float = 0.0,
                   passive_kd: float = 0.0) -> int:
        """Muscle-tendon unit routed through body-frame waypoints
        (reference: builder.py:6303). Activation drives contraction forces
        along the waypoint path (applied by SolverSemiImplicit); passive_ke/
        passive_kd add tension when the path stretches past its rest length
        lm + lt (spatial-tendon elasticity)."""
        idx = len(self.muscle_params)
        self.muscle_start.append(len(self.muscle_bodies))
        self.muscle_params.append((float(f0), float(lm), float(lt),
                                   float(lmax), float(pen),
                                   float(passive_ke), float(passive_kd)))
        self.muscle_activations.append(0.0)
        for b, p in zip(bodies, positions):
            self.muscle_bodies.append(int(b))
            self.muscle_points.append(np.asarray(p, dtype=np.float64))
        return idx

    def add_tendon_fixed(self, joints: Sequence[int],
                         coefs: Sequence[float], stiffness: float = 0.0,
                         damping: float = 0.0, rest_length: float = 0.0,
                         key: Optional[str] = None) -> int:
        """Fixed tendon: length L = sum coef_i * q_i over 1-dof joints
        (reference: SolverMuJoCo fixed tendons, solver_mujoco.py tendon
        conversion). Passive force -ke (L - L0) - kd Ldot plus any actuator
        force routed through ``control.tendon_f`` maps back to the joints as
        tau_i += coef_i * f."""
        idx = len(self.tendon_params)
        self.tendon_joints.append([int(j) for j in joints])
        self.tendon_coefs.append([float(c) for c in coefs])
        self.tendon_params.append((float(stiffness), float(damping),
                                   float(rest_length)))
        self.tendon_key.append(key or f"tendon_{idx}")
        return idx

    def add_tendon_spatial(self, elems: Sequence[tuple],
                           stiffness: float = 0.0, damping: float = 0.0,
                           rest_length: Optional[float] = None,
                           key: Optional[str] = None) -> int:
        """Spatial tendon routed through body-frame sites with optional
        sphere/cylinder wrap geoms (MuJoCo <spatial> semantics; reference
        carries tendon_wrap_* arrays, import_mjcf.py:2865-2868).

        ``elems`` is a path-ordered sequence of tuples:
            ("site", body, pos)
            ("sphere", body, pos, radius, side_or_None)
            ("cylinder", body, pos, axis, radius, side_or_None)
        The path length, wrap routing and moment arms are evaluated inside
        the jitted step (sim/tendon.py); passive force is
        ``-ke (L - L0) - kd Ldot`` mapped through the moment arms, and
        actuators can target the tendon via the MJCF importer.
        ``rest_length=None`` computes L0 from the build pose at finalize.
        """
        from .tendon import SpatialTendonPath
        idx = len(self.sten_params)
        self.sten_paths.append(SpatialTendonPath(elems))
        self.sten_params.append((float(stiffness), float(damping),
                                 float("nan") if rest_length is None
                                 else float(rest_length)))
        self.sten_key.append(key or f"sten_{idx}")
        return idx

    def add_equality_constraint(
        self, constraint_type: EqType,
        body1: int = -1, body2: int = -1,
        joint1: int = -1, joint2: int = -1,
        anchor: Vec3 = (0.0, 0.0, 0.0),
        relpose: Optional[Transform] = None,
        polycoef: Sequence[float] = (0.0, 1.0, 0.0, 0.0, 0.0),
        torquescale: float = 1.0,
        enabled: bool = True,
        key: Optional[str] = None,
    ) -> int:
        """CONNECT/WELD (bodies) or JOINT (coordinate coupling) constraint."""
        ct = EqType(constraint_type)
        idx = len(self.eq_type)
        if ct == EqType.JOINT:
            obj1, obj2 = int(joint1), int(joint2)
        else:
            obj1, obj2 = int(body1), int(body2)
        self.eq_type.append(int(ct))
        self.eq_obj1.append(obj1)
        self.eq_obj2.append(obj2)
        self.eq_anchor.append(np.asarray(anchor, dtype=np.float64))
        self.eq_relpose.append(_as_transform(relpose))
        pc = np.zeros(5)
        pc[: len(polycoef)] = np.asarray(polycoef, dtype=np.float64)[:5]
        self.eq_polycoef.append(pc)
        self.eq_enabled.append(bool(enabled))
        self.eq_torquescale.append(float(torquescale))
        self.eq_world.append(self._current_world)
        self.eq_key.append(key or f"equality_{idx}")
        return idx

    def add_constraint_mimic(self, joint1: int, joint2: int,
                             multiplier: float = 1.0, offset: float = 0.0,
                             enabled: bool = True,
                             key: Optional[str] = None) -> int:
        """Mimic constraint: q1 = offset + multiplier * q2
        (reference: builder.py:5292)."""
        return self.add_equality_constraint(
            EqType.JOINT, joint1=joint1, joint2=joint2,
            polycoef=(offset, multiplier, 0.0, 0.0, 0.0),
            enabled=enabled, key=key)

    # ------------------------------------------------------------------
    # custom attributes (reference: builder.py:807,1709,1856)
    # ------------------------------------------------------------------
    def add_custom_attribute(self, name: str, frequency: AttributeFrequency,
                             assignment: AttributeAssignment = AttributeAssignment.MODEL,
                             shape: Tuple[int, ...] = (), dtype=np.float32,
                             default: Any = 0.0) -> CustomAttribute:
        """Register a namespaced per-entity attribute, e.g. ``mujoco:gainprm``."""
        if name in self.custom_attributes:
            return self.custom_attributes[name]
        attr = CustomAttribute(name=name, frequency=frequency,
                               assignment=assignment, shape=tuple(shape),
                               dtype=dtype, default=default)
        self.custom_attributes[name] = attr
        return attr

    def add_custom_values(self, name: str, values: Dict[int, Any]):
        """Set per-entity values for a registered custom attribute."""
        if name not in self.custom_attributes:
            raise KeyError(f"Custom attribute {name!r} is not registered")
        self.custom_attributes[name].values.update(values)

    def request_state_attributes(self, *names: str):
        self._requested_state_attrs.update(names)

    def request_contact_attributes(self, *names: str):
        self._requested_contact_attrs.update(names)

    # ------------------------------------------------------------------
    # merging builders (reference: builder.py:4064 add_builder)
    # ------------------------------------------------------------------
    def add_builder(self, other: "ModelBuilder",
                    xform: Optional[Transform] = None,
                    key_prefix: Optional[str] = None) -> None:
        """Merge another builder's entities into this one, offsetting indices.

        World assignment: the merged entities take this builder's
        ``current_world`` (matching reference semantics when used inside
        ``begin_world``/``add_world``).
        """
        X = None if xform is None else _as_transform(xform)
        pre = key_prefix + "/" if key_prefix else ""
        b0 = self.body_count
        s0 = self.shape_count
        j0 = self.joint_count
        p0 = self.particle_count
        a0 = self.articulation_count
        e0 = len(self.eq_type)
        w = self._current_world

        # bodies
        for i in range(other.body_count):
            bq = other.body_q[i]
            if X is not None:
                bq = np_transform_multiply(X, bq)
            self.body_q.append(bq.copy())
            self.body_qd.append(other.body_qd[i].copy())
            self.body_com.append(other.body_com[i].copy())
            self.body_mass.append(other.body_mass[i])
            self.body_inertia.append(other.body_inertia[i].copy())
            self.body_flags.append(other.body_flags[i])
            self.body_world.append(w)
            self.body_key.append(pre + other.body_key[i])

        # shapes
        for i in range(other.shape_count):
            body = other.shape_body[i]
            xf = other.shape_transform[i]
            if body < 0 and X is not None:
                xf = np_transform_multiply(X, xf)
            self.shape_transform.append(xf.copy())
            self.shape_body.append(body + b0 if body >= 0 else -1)
            self.shape_type.append(other.shape_type[i])
            self.shape_scale.append(other.shape_scale[i].copy())
            self.shape_flags.append(other.shape_flags[i])
            self.shape_thickness.append(other.shape_thickness[i])
            self.shape_material_mu.append(other.shape_material_mu[i])
            self.shape_material_restitution.append(other.shape_material_restitution[i])
            self.shape_material_ke.append(other.shape_material_ke[i])
            self.shape_material_kd.append(other.shape_material_kd[i])
            self.shape_material_kf.append(other.shape_material_kf[i])
            self.shape_material_kh.append(other.shape_material_kh[i])
            self.shape_collision_group.append(other.shape_collision_group[i])
            self.shape_contype.append(other.shape_contype[i])
            self.shape_conaffinity.append(other.shape_conaffinity[i])
            self.shape_world.append(w)
            self.shape_source.append(other.shape_source[i])
            self.shape_sdf_resolution.append(other.shape_sdf_resolution[i])
            self.shape_key.append(pre + other.shape_key[i])
        for (sa, sb) in other.shape_collision_filter_pairs:
            self.shape_collision_filter_pairs.add((sa + s0, sb + s0))
        for (ba, bb) in other._body_filter_pairs:
            self._body_filter_pairs.add((ba + b0, bb + b0))

        # articulations
        for i in range(other.articulation_count):
            self.articulation_start.append(other.articulation_start[i] + j0)
            self.articulation_key.append(pre + other.articulation_key[i])
            self.articulation_world.append(w)

        # joints
        for i in range(other.joint_count):
            parent = other.joint_parent[i]
            self.joint_type.append(other.joint_type[i])
            self.joint_parent.append(parent + b0 if parent >= 0 else -1)
            self.joint_child.append(other.joint_child[i] + b0)
            X_p = other.joint_X_p[i]
            if parent < 0 and X is not None:
                X_p = np_transform_multiply(X, X_p)
            self.joint_X_p.append(X_p.copy())
            self.joint_X_c.append(other.joint_X_c[i].copy())
            self.joint_key.append(pre + other.joint_key[i])
            self.joint_world.append(w)
            self.joint_enabled.append(other.joint_enabled[i])
            self.joint_articulation.append(other.joint_articulation[i] + a0)
            self.joint_dof_dim.append(other.joint_dof_dim[i])
            self.joint_q_start.append(self.joint_q_start[-1] +
                                      (other.joint_q_start[i + 1] - other.joint_q_start[i]))
            self.joint_qd_start.append(self.joint_qd_start[-1] +
                                       (other.joint_qd_start[i + 1] - other.joint_qd_start[i]))
        # per-dof / per-coord arrays are flat concatenations
        self.joint_axis.extend(a.copy() for a in other.joint_axis)
        self.joint_armature.extend(other.joint_armature)
        self.joint_target_ke.extend(other.joint_target_ke)
        self.joint_target_kd.extend(other.joint_target_kd)
        self.joint_limit_lower.extend(other.joint_limit_lower)
        self.joint_limit_upper.extend(other.joint_limit_upper)
        self.joint_limit_ke.extend(other.joint_limit_ke)
        self.joint_limit_kd.extend(other.joint_limit_kd)
        self.joint_friction.extend(other.joint_friction)
        self.joint_effort_limit.extend(other.joint_effort_limit)
        self.joint_velocity_limit.extend(other.joint_velocity_limit)
        self.joint_qd.extend(other.joint_qd)
        self.joint_dof_mode.extend(other.joint_dof_mode)
        self.joint_q.extend(other.joint_q)
        self.joint_target_q.extend(other.joint_target_q)
        # free/distance joint root coordinates live in world space: re-root them
        if X is not None:
            for i in range(other.joint_count):
                jt = JointType(other.joint_type[i])
                if jt in (JointType.FREE, JointType.DISTANCE) and other.joint_parent[i] < 0:
                    qs = self.joint_q_start[j0 + i]
                    t = np.array(self.joint_q[qs:qs + 7])
                    t = np_transform_multiply(X, t)
                    self.joint_q[qs:qs + 7] = t.tolist()
                    self.joint_target_q[qs:qs + 7] = t.tolist()

        # particles
        for i in range(other.particle_count):
            p = other.particle_q[i]
            v = other.particle_qd[i]
            if X is not None:
                p = np_transform_point(X, p)
                v = np_transform_vector(X, v)
            self.particle_q.append(np.asarray(p))
            self.particle_qd.append(np.asarray(v))
            self.particle_mass.append(other.particle_mass[i])
            self.particle_radius.append(other.particle_radius[i])
            self.particle_flags.append(other.particle_flags[i])
            self.particle_world.append(w)
        self.spring_indices.extend((a + p0, b + p0) for a, b in other.spring_indices)
        self.spring_rest_length.extend(other.spring_rest_length)
        self.spring_stiffness.extend(other.spring_stiffness)
        self.spring_damping.extend(other.spring_damping)
        self.tri_indices.extend((a + p0, b + p0, c + p0) for a, b, c in other.tri_indices)
        self.tri_poses.extend(m.copy() for m in other.tri_poses)
        self.tri_materials.extend(other.tri_materials)
        self.tri_areas.extend(other.tri_areas)
        self.edge_indices.extend(
            tuple(x + p0 if x >= 0 else -1 for x in e) for e in other.edge_indices)
        self.edge_rest_angle.extend(other.edge_rest_angle)
        self.edge_rest_length.extend(other.edge_rest_length)
        self.edge_bending_properties.extend(other.edge_bending_properties)
        self.tet_indices.extend(tuple(x + p0 for x in t) for t in other.tet_indices)
        self.tet_poses.extend(m.copy() for m in other.tet_poses)
        self.tet_materials.extend(other.tet_materials)

        # equality constraints
        for i in range(len(other.eq_type)):
            ct = EqType(other.eq_type[i])
            off = j0 if ct == EqType.JOINT else b0
            self.eq_type.append(other.eq_type[i])
            self.eq_obj1.append(other.eq_obj1[i] + off if other.eq_obj1[i] >= 0 else -1)
            self.eq_obj2.append(other.eq_obj2[i] + off if other.eq_obj2[i] >= 0 else -1)
            self.eq_anchor.append(other.eq_anchor[i].copy())
            self.eq_relpose.append(other.eq_relpose[i].copy())
            self.eq_polycoef.append(other.eq_polycoef[i].copy())
            self.eq_enabled.append(other.eq_enabled[i])
            self.eq_torquescale.append(other.eq_torquescale[i])
            self.eq_world.append(w)
            self.eq_key.append(pre + other.eq_key[i])

        # custom attributes: merge registry + offset values by frequency
        ENTITY_OFFSETS = {
            AttributeFrequency.BODY: b0, AttributeFrequency.SHAPE: s0,
            AttributeFrequency.JOINT: j0, AttributeFrequency.PARTICLE: p0,
            AttributeFrequency.ARTICULATION: a0, AttributeFrequency.EQUALITY: e0,
            AttributeFrequency.JOINT_DOF: self.joint_qd_start[j0] if j0 < len(self.joint_qd_start) else 0,
            AttributeFrequency.JOINT_COORD: self.joint_q_start[j0] if j0 < len(self.joint_q_start) else 0,
        }
        for name, attr in other.custom_attributes.items():
            mine = self.add_custom_attribute(name, attr.frequency, attr.assignment,
                                             attr.shape, attr.dtype, attr.default)
            off = ENTITY_OFFSETS.get(attr.frequency, 0)
            if attr.frequency == AttributeFrequency.WORLD:
                for k, v in attr.values.items():
                    mine.values[w if w >= 0 else k] = v
            else:
                for k, v in attr.values.items():
                    mine.values[k + off] = v
        self._requested_state_attrs.update(other._requested_state_attrs)
        self._requested_contact_attrs.update(other._requested_contact_attrs)

    # ------------------------------------------------------------------
    # finalize (reference: builder.py:10949)
    # ------------------------------------------------------------------
    def _should_collide(self, a: int, b: int) -> bool:
        """Mirror of reference test_world_and_group_pair + filters
        (geometry/broad_phase_common.py:174-221)."""
        if a == b:
            return False
        ba, bb = self.shape_body[a], self.shape_body[b]
        if ba == bb:
            return False
        if ba < 0 and bb < 0:
            return False  # two static shapes
        fa, fb = self.shape_flags[a], self.shape_flags[b]
        COLL = int(ShapeFlags.COLLIDE_SHAPES)
        if not (fa & COLL) or not (fb & COLL):
            return False
        wa, wb = self.shape_world[a], self.shape_world[b]
        if wa != -1 and wb != -1 and wa != wb:
            return False
        ct_a, ca_a = self.shape_contype[a], self.shape_conaffinity[a]
        ct_b, ca_b = self.shape_contype[b], self.shape_conaffinity[b]
        if not ((ct_a & ca_b) or (ct_b & ca_a)):
            return False
        ga, gb = self.shape_collision_group[a], self.shape_collision_group[b]
        if ga == 0 or gb == 0:
            return False
        if ga > 0 and not (ga == gb or gb < 0):
            return False
        if ga < 0 and ga == gb:
            return False
        key = (min(a, b), max(a, b))
        if key in self.shape_collision_filter_pairs:
            return False
        if ba >= 0 and bb >= 0:
            bkey = (min(ba, bb), max(ba, bb))
            if bkey in self._body_filter_pairs:
                return False
        gt_a, gt_b = self.shape_type[a], self.shape_type[b]
        if gt_a == int(GeoType.PLANE) and gt_b == int(GeoType.PLANE):
            return False
        if gt_a == int(GeoType.NONE) or gt_b == int(GeoType.NONE):
            return False
        return True

    def _compute_candidate_pairs(self) -> Tuple[np.ndarray, np.ndarray, int]:
        """All shape pairs that can ever collide, with cumulative contact-slot
        offsets. O(S^2) host loop with an early world-bucket split so replicated
        scenes cost O(W * s^2) not O((W*s)^2)."""
        # native fast path for large scenes (newton_tpu/native)
        if self.shape_count > 2048:
            try:
                from ..native import native_candidate_pairs
                filters = set(self.shape_collision_filter_pairs)
                # expand body-level filters to shape pairs
                body_shapes: Dict[int, List[int]] = {}
                for si, bi in enumerate(self.shape_body):
                    body_shapes.setdefault(bi, []).append(si)
                for (ba, bb) in self._body_filter_pairs:
                    for sa in body_shapes.get(ba, []):
                        for sb in body_shapes.get(bb, []):
                            filters.add((min(sa, sb), max(sa, sb)))
                pairs = native_candidate_pairs(
                    self.shape_body, self.shape_world,
                    self.shape_collision_group, self.shape_contype,
                    self.shape_conaffinity, self.shape_type,
                    self.shape_flags, filters,
                    int(ShapeFlags.COLLIDE_SHAPES), int(GeoType.PLANE),
                    int(GeoType.NONE))
                if pairs is not None:
                    pairs = pairs[np.lexsort((pairs[:, 1], pairs[:, 0]))]
                    slots = np.zeros(len(pairs) + 1, dtype=np.int32)
                    for i, (a, b) in enumerate(pairs):
                        slots[i + 1] = slots[i] + _pair_slots(
                            self.shape_type[a], self.shape_type[b])
                    return pairs.astype(np.int32), slots, int(slots[-1])
            except Exception:
                pass

        by_world: Dict[int, List[int]] = {}
        COLL = int(ShapeFlags.COLLIDE_SHAPES)
        for s in range(self.shape_count):
            if not (self.shape_flags[s] & COLL):
                continue
            by_world.setdefault(self.shape_world[s], []).append(s)
        globals_ = by_world.get(-1, [])
        pairs: List[Tuple[int, int]] = []
        for w, shapes in by_world.items():
            if w == -1:
                continue
            for ii in range(len(shapes)):
                for jj in range(ii + 1, len(shapes)):
                    a, b = shapes[ii], shapes[jj]
                    if self._should_collide(a, b):
                        pairs.append((a, b))
            for a in shapes:
                for g in globals_:
                    if self._should_collide(a, g):
                        # order: put the "simpler" static geom second
                        pairs.append((a, g) if self.shape_body[g] < 0 else (g, a))
        for ii in range(len(globals_)):
            for jj in range(ii + 1, len(globals_)):
                a, b = globals_[ii], globals_[jj]
                if self._should_collide(a, b):
                    pairs.append((a, b))
        pairs.sort()
        slots = np.zeros(len(pairs) + 1, dtype=np.int32)
        for i, (a, b) in enumerate(pairs):
            slots[i + 1] = slots[i] + _pair_slots(self.shape_type[a], self.shape_type[b])
        pair_arr = (np.asarray(pairs, dtype=np.int32).reshape(-1, 2)
                    if pairs else np.zeros((0, 2), dtype=np.int32))
        return pair_arr, slots, int(slots[-1])

    def _compute_soft_pairs(self) -> Tuple[np.ndarray, int]:
        """Particle-vs-shape candidate pairs (1 slot each)."""
        COLL = int(ShapeFlags.COLLIDE_PARTICLES)
        shapes_by_world: Dict[int, List[int]] = {}
        for s in range(self.shape_count):
            if self.shape_flags[s] & COLL:
                shapes_by_world.setdefault(self.shape_world[s], []).append(s)
        pairs: List[Tuple[int, int]] = []
        for p in range(self.particle_count):
            pw = self.particle_world[p]
            cand = shapes_by_world.get(pw, []) if pw != -1 else []
            cand = cand + shapes_by_world.get(-1, [])
            if pw == -1:
                cand = [s for lst in shapes_by_world.values() for s in lst]
            for s in cand:
                pairs.append((p, s))
        arr = (np.asarray(sorted(set(pairs)), dtype=np.int32).reshape(-1, 2)
               if pairs else np.zeros((0, 2), dtype=np.int32))
        return arr, len(arr)

    def _detect_homogeneous(self) -> Tuple[bool, Dict[str, int]]:
        """Worlds are homogeneous when every world holds identical entity
        counts and identical per-world topology — enables (W, n) vmap layout."""
        W = self.world_count
        counts: Dict[str, int] = {}
        if W == 0:
            return False, counts
        groups = {
            "body": self.body_world, "shape": self.shape_world,
            "joint": self.joint_world, "particle": self.particle_world,
            "articulation": self.articulation_world, "eq": self.eq_world,
        }
        for name, worlds in groups.items():
            wa = np.asarray(worlds, dtype=np.int64)
            local = wa[wa >= 0]
            per_world = np.bincount(local, minlength=W) if len(local) else \
                np.zeros(W, dtype=np.int64)
            if len(np.unique(per_world)) > 1:
                return False, counts
            counts[name] = int(per_world[0]) if W else 0
            # entities must be contiguous per world and ordered by world
            if len(local) and (np.diff(local) < 0).any():
                return False, counts
        return True, counts

    def _collision_radius(self, s: int) -> float:
        g = GeoType(self.shape_type[s])
        sc = self.shape_scale[s]
        if g == GeoType.SPHERE:
            return float(sc[0])
        if g == GeoType.BOX:
            return float(np.linalg.norm(sc))
        if g in (GeoType.CAPSULE, GeoType.CYLINDER, GeoType.CONE):
            return float(sc[0] + sc[1])
        if g == GeoType.ELLIPSOID:
            return float(np.max(sc))
        if g in (GeoType.MESH, GeoType.CONVEX):
            src = self.shape_source[s]
            if src is not None and src.num_vertices:
                return float(np.max(np.linalg.norm(src.vertices * np.asarray(sc), axis=1)))
        if g == GeoType.PLANE:
            return MAXVAL
        if g == GeoType.HFIELD:
            return float(np.linalg.norm(sc))
        return 1.0

    def finalize(self, device=None, requires_grad: bool = False,
                 dtype=None) -> Model:
        """Build the frozen Model pytree (reference: builder.py:10949).

        ``requires_grad`` is accepted for API parity; JAX arrays are always
        differentiable. ``dtype`` defaults to float32.
        """
        import jax
        import jax.numpy as jnp

        if self._current_world != -1:
            raise RuntimeError("finalize() called inside an open world scope")
        dtype = dtype or jnp.float32

        # seed FREE/DISTANCE joint velocities from add_body(qd=...) so a
        # floating body's initial twist survives into joint_qd0 (free qd
        # layout is [v_com, w], matching body_qd)
        for j in range(self.joint_count):
            if self.joint_type[j] not in (int(JointType.FREE),
                                          int(JointType.DISTANCE)):
                continue
            child = self.joint_child[j]
            bqd = np.asarray(self.body_qd[child], dtype=np.float64)
            if not np.any(bqd):
                continue
            ds = self.joint_qd_start[j]
            if not np.any(self.joint_qd[ds:ds + 6]):
                self.joint_qd[ds:ds + 6] = list(bqd[:6])

        st = ModelStructure()
        st.world_count = max(self.world_count, 1)
        st.body_count = self.body_count
        st.shape_count = self.shape_count
        st.joint_count = self.joint_count
        st.joint_coord_count = self.joint_coord_count
        st.joint_dof_count = self.joint_dof_count
        st.articulation_count = self.articulation_count
        st.particle_count = self.particle_count
        st.spring_count = self.spring_count
        st.tri_count = self.tri_count
        st.edge_count = self.edge_count
        st.tet_count = self.tet_count
        st.eq_count = len(self.eq_type)
        st.up_axis = int(self.up_axis)
        st.tendon_count = len(self.tendon_params)
        if st.tendon_count:
            W = max(len(js) for js in self.tendon_joints)
            t_coord = np.zeros((st.tendon_count, W), dtype=np.int32)
            t_dof = np.zeros((st.tendon_count, W), dtype=np.int32)
            t_coef = np.zeros((st.tendon_count, W))
            for t, (js, cs) in enumerate(zip(self.tendon_joints,
                                             self.tendon_coefs)):
                for k, (j, c) in enumerate(zip(js, cs)):
                    t_coord[t, k] = self.joint_q_start[j]
                    t_dof[t, k] = self.joint_qd_start[j]
                    t_coef[t, k] = c
            st.tendon_coord = t_coord
            st.tendon_dof = t_dof
            st.tendon_coef = t_coef
        else:
            st.tendon_coord = np.zeros((0, 1), dtype=np.int32)
            st.tendon_dof = np.zeros((0, 1), dtype=np.int32)
            st.tendon_coef = np.zeros((0, 1))
        # spatial tendons: static path descriptions; default rest lengths
        # are the build-pose path lengths (MuJoCo springlength=-1 semantics)
        st.sten_count = len(self.sten_params)
        st.sten_paths = list(self.sten_paths)
        st.sten_key = list(self.sten_key)
        sten_params = np.asarray(self.sten_params,
                                 dtype=np.float64).reshape(-1, 3)
        if st.sten_count and np.isnan(sten_params[:, 2]).any():
            from .tendon import spatial_tendon_rest_length
            for t in range(st.sten_count):
                if np.isnan(sten_params[t, 2]):
                    sten_params[t, 2] = spatial_tendon_rest_length(
                        st.sten_paths[t], self.body_q)
        # structured MuJoCo actuation tables (import_mjcf actuation="mjc");
        # consumed by the generalized solver's actuation stage
        st.mjc_actuation = getattr(self, "mjc_actuation", None)
        # MJCF <option> values the solver honors (integrator, timestep —
        # reference solver_mujoco.py:613-614 reads the same fields)
        st.mjc_options = dict(getattr(self, "mjc_options", {}))
        st.muscle_count = len(self.muscle_params)
        st.muscle_start = np.asarray(
            self.muscle_start + [len(self.muscle_bodies)], dtype=np.int32)

        st.joint_type = np.asarray(self.joint_type, dtype=np.int32)
        st.joint_parent = np.asarray(self.joint_parent, dtype=np.int32)
        st.joint_child = np.asarray(self.joint_child, dtype=np.int32)
        st.joint_q_start = np.asarray(self.joint_q_start, dtype=np.int32)
        st.joint_qd_start = np.asarray(self.joint_qd_start, dtype=np.int32)
        st.joint_dof_dim = (np.asarray(self.joint_dof_dim, dtype=np.int32).reshape(-1, 2)
                            if self.joint_dof_dim else np.zeros((0, 2), dtype=np.int32))
        st.joint_dof_mode = np.asarray(self.joint_dof_mode, dtype=np.int32)
        st.joint_world = np.asarray(self.joint_world, dtype=np.int32)
        st.articulation_start = np.asarray(
            self.articulation_start + [self.joint_count], dtype=np.int32)
        st.articulation_world = np.asarray(self.articulation_world, dtype=np.int32)
        # parent joint in the kinematic chain (for FK scans): joint whose child
        # body is this joint's parent body; -1 at articulation roots
        child_of = {}
        for j, c in enumerate(self.joint_child):
            child_of[c] = j
        st.joint_parent_joint = np.asarray(
            [child_of.get(p, -1) for p in self.joint_parent], dtype=np.int32)

        st.body_world = np.asarray(self.body_world, dtype=np.int32)
        st.shape_world = np.asarray(self.shape_world, dtype=np.int32)
        st.particle_world = np.asarray(self.particle_world, dtype=np.int32)
        st.eq_world = np.asarray(self.eq_world, dtype=np.int32)
        st.shape_body = np.asarray(self.shape_body, dtype=np.int32)
        st.shape_type = np.asarray(self.shape_type, dtype=np.int32)
        st.shape_flags = np.asarray(self.shape_flags, dtype=np.int32)
        st.shape_collision_group = np.asarray(self.shape_collision_group, dtype=np.int32)
        st.eq_type = np.asarray(self.eq_type, dtype=np.int32)

        st.body_key = list(self.body_key)
        st.joint_key = list(self.joint_key)
        st.shape_key = list(self.shape_key)
        st.articulation_key = list(self.articulation_key)
        st.shape_filter_pairs = set(self.shape_collision_filter_pairs)

        # geometry sources: pool meshes (dedup by object identity)
        mesh_ids: Dict[int, int] = {}
        st.meshes = []
        shape_source_idx = np.full(self.shape_count, -1, dtype=np.int32)
        for s, src in enumerate(self.shape_source):
            if isinstance(src, Mesh):
                mid = mesh_ids.get(id(src))
                if mid is None:
                    mid = len(st.meshes)
                    mesh_ids[id(src)] = mid
                    st.meshes.append(src)
                shape_source_idx[s] = mid
            elif isinstance(src, SDF):
                shape_source_idx[s] = len(st.sdfs)
                st.sdfs.append(src)
            elif isinstance(src, Heightfield):
                shape_source_idx[s] = len(st.heightfields)
                st.heightfields.append(src)
        st.shape_source_id = shape_source_idx
        # gaussian splat clouds (visual only) keep their per-shape source
        # dicts for viewers and the tiled camera's splat channel
        st.gaussians = [(s, src) for s, src in enumerate(self.shape_source)
                        if isinstance(src, dict) and "means" in src]
        v_off = [0]
        i_off = [0]
        for m in st.meshes:
            v_off.append(v_off[-1] + m.num_vertices)
            i_off.append(i_off[-1] + len(m.indices))
        st.mesh_vertex_offsets = np.asarray(v_off, dtype=np.int32)
        st.mesh_index_offsets = np.asarray(i_off, dtype=np.int32)
        if st.meshes:
            mesh_points = np.concatenate([m.vertices for m in st.meshes], axis=0)
            mesh_indices = np.concatenate(
                [m.indices + v_off[k] for k, m in enumerate(st.meshes)], axis=0)
        else:
            mesh_points = np.zeros((0, 3))
            mesh_indices = np.zeros((0,), dtype=np.int32)

        # mesh contact sampling + SDF baking for pairs that need them
        sample_K = int(getattr(self, "mesh_sample_count", 32))
        sample_points = np.zeros((self.shape_count, sample_K, 3))
        shape_sdf_id = np.full(self.shape_count, -1, dtype=np.int32)
        shape_sdf_tex_id = np.full(self.shape_count, -1, dtype=np.int32)
        sdf_res = 24
        baked: Dict[tuple, tuple] = {}
        sdf_grids: List[np.ndarray] = []
        sdf_lowers: List[np.ndarray] = []
        sdf_uppers: List[np.ndarray] = []
        sdf_texes: List[Any] = []
        mesh_types = (int(GeoType.MESH), int(GeoType.CONVEX))
        # which mesh shapes appear as the SDF side of a pair: any mesh paired
        # with a mesh, or a primitive that samples into the mesh
        needs_sdf = set()
        _mpr_types = (int(GeoType.CONVEX), int(GeoType.BOX))
        for a in range(self.shape_count):
            if self.shape_type[a] not in mesh_types:
                continue
            ta = self.shape_type[a]
            for b in range(self.shape_count):
                if a == b:
                    continue
                if not self._should_collide(min(a, b), max(a, b)):
                    continue
                tb = self.shape_type[b]
                if ta == int(GeoType.CONVEX) and tb in _mpr_types:
                    continue    # MPR narrow phase, no bake needed
                if ta == int(GeoType.CONVEX) and tb == int(GeoType.PLANE):
                    continue    # one-way analytic sampling
                # NOTE: plain MESH shapes keep their bake even for
                # plane-only pairs — raycast/sensors trace the grid
                needs_sdf.add(a)
                break
        # convex hull vertex clouds for the MPR narrow phase (CONVEX shapes
        # carry their hull Mesh; BOX shapes get exact corners) — lets
        # convex-convex pairs collide without an SDF bake
        # (geometry/mpr.py; reference geometry/mpr.py + support_function.py)
        hull_max = 1
        hull_lists: Dict[int, np.ndarray] = {}
        for sidx in range(self.shape_count):
            t = self.shape_type[sidx]
            sc = np.asarray(self.shape_scale[sidx], dtype=np.float64)
            if t == int(GeoType.CONVEX) and isinstance(
                    self.shape_source[sidx], Mesh):
                hv = np.asarray(self.shape_source[sidx].vertices,
                                dtype=np.float64) * sc
                if len(hv) > 64:
                    hv = _fps_sample(hv, 64)
                hull_lists[sidx] = hv
                hull_max = max(hull_max, len(hv))
            elif t == int(GeoType.BOX):
                signs = np.array([[sx, sy, sz] for sx in (-1, 1)
                                  for sy in (-1, 1) for sz in (-1, 1)],
                                 dtype=np.float64)
                hull_lists[sidx] = signs * sc[None, :]
                hull_max = max(hull_max, 8)
        shape_hull_verts = np.zeros((self.shape_count, hull_max, 3),
                                    dtype=np.float32)
        for sidx, hv in hull_lists.items():
            shape_hull_verts[sidx, :len(hv)] = hv
            shape_hull_verts[sidx, len(hv):] = hv[0]      # pad by repeat

        _sp_cache: Dict[tuple, np.ndarray] = {}
        for sidx in range(self.shape_count):
            t = GeoType(self.shape_type[sidx])
            sc = self.shape_scale[sidx]
            if t not in (GeoType.MESH, GeoType.CONVEX, GeoType.PLANE,
                         GeoType.NONE, GeoType.SDF, GeoType.HFIELD):
                key = (int(t), float(sc[0]), float(sc[1]), float(sc[2]))
                pts = _sp_cache.get(key)
                if pts is None:
                    pts = _primitive_sample_points(t, sc, sample_K)
                    _sp_cache[key] = pts
                sample_points[sidx] = pts
        for sidx, src in enumerate(self.shape_source):
            if self.shape_type[sidx] in mesh_types and isinstance(src, Mesh):
                sv = src.vertices * self.shape_scale[sidx]
                pts = _surface_sample_candidates(sv, src.indices)
                seeds = _feature_edge_seeds(sv, src.indices, sample_K)
                sample_points[sidx] = _fps_sample(pts, sample_K, seeds=seeds)
                if sidx in needs_sdf:
                    res = int(self.shape_sdf_resolution[sidx]) or sdf_res
                    scl = np.asarray(self.shape_scale[sidx], dtype=np.float64)
                    unit = np.allclose(scl, 1.0)
                    use_tex = res >= _SDF_TEXTURE_MIN_RES
                    key = (id(src), res, use_tex, tuple(np.round(scl, 12)))
                    if key not in baked:
                        # bake in the shape's SCALED local frame: contact
                        # sample points are transformed without scale, so
                        # the grid must live in scaled coordinates too
                        bsrc = src if unit else Mesh(
                            src.vertices * scl, src.indices,
                            compute_inertia=False)
                        if use_tex:
                            # sparse quantized texture storage for high-res
                            # bakes (geometry/sdf_texture.py; reference
                            # sdf_texture.py:126 TextureSDFData)
                            from ..geometry.sdf_cache import (
                                cached_bake_texture_sdf)
                            tex = cached_bake_texture_sdf(bsrc,
                                                          resolution=res)
                            baked[key] = ("tex", len(sdf_texes))
                            sdf_texes.append(tex)
                        else:
                            from ..geometry.sdf_cache import (
                                cached_bake_mesh_sdf)
                            sdfobj = cached_bake_mesh_sdf(bsrc,
                                                          resolution=res)
                            baked[key] = ("dense", len(sdf_grids))
                            sdf_grids.append(sdfobj.data)
                            sdf_lowers.append(sdfobj.lower)
                            sdf_uppers.append(sdfobj.upper)
                    kind, kid = baked[key]
                    if kind == "tex":
                        shape_sdf_tex_id[sidx] = kid
                    else:
                        shape_sdf_id[sidx] = kid
            elif (self.shape_type[sidx] == int(GeoType.HFIELD)
                  and isinstance(src, Heightfield)):
                # heightfield SDF: d(x, y, z) = z - h(x, y) over the padded
                # field box (gentle-slope approximation; exact at contact
                # depths within the margin). Centered at origin like
                # heightfield_to_mesh (terrain.py).
                hfv = src.heights.astype(np.float64) + src.base
                nx, ny = src.nx, src.ny
                R = sdf_res
                pad = max(0.5, 0.1 * (hfv.max() - hfv.min() + 1.0))
                lo = np.array([-src.size_x / 2, -src.size_y / 2,
                               hfv.min() - pad])
                hi = np.array([src.size_x / 2, src.size_y / 2,
                               hfv.max() + pad])
                xs = np.linspace(0, nx - 1, R)
                ys = np.linspace(0, ny - 1, R)
                ix = np.clip(xs.astype(int), 0, nx - 2)
                iy = np.clip(ys.astype(int), 0, ny - 2)
                fx = (xs - ix)[:, None]
                fy = (ys - iy)[None, :]
                h00 = hfv[np.ix_(ix, iy)]
                h10 = hfv[np.ix_(ix + 1, iy)]
                h01 = hfv[np.ix_(ix, iy + 1)]
                h11 = hfv[np.ix_(ix + 1, iy + 1)]
                hg = (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
                      + h01 * (1 - fx) * fy + h11 * fx * fy)      # (R, R)
                zs = np.linspace(lo[2], hi[2], R)
                grid = (zs[None, None, :] - hg[:, :, None]).astype(np.float32)
                shape_sdf_id[sidx] = len(sdf_grids)
                sdf_grids.append(grid)
                sdf_lowers.append(lo)
                sdf_uppers.append(hi)
                # surface sample points (for hfield-vs-mesh reverse sampling)
                gx, gy = np.meshgrid(
                    np.linspace(-src.size_x / 2, src.size_x / 2, nx),
                    np.linspace(-src.size_y / 2, src.size_y / 2, ny),
                    indexing="ij")
                surf = np.stack([gx, gy, hfv], axis=-1).reshape(-1, 3)
                sample_points[sidx] = _fps_sample(surf, sample_K)
            elif self.shape_type[sidx] == int(GeoType.SDF) and isinstance(src, SDF):
                shape_sdf_id[sidx] = len(sdf_grids)
                sdf_grids.append(src.data)
                sdf_lowers.append(src.lower)
                sdf_uppers.append(src.upper)
        st.shape_sdf_id = shape_sdf_id
        st.shape_sdf_tex_id = shape_sdf_tex_id

        # hydroelastic pressure integration: Voronoi-partition each shape's
        # surface area over its contact samples so sum(p_i * area_i)
        # approximates the patch-force integral the reference computes over
        # marching-cubes faces (sdf_hydroelastic.py:1521, 16:4)
        sample_areas = np.zeros((self.shape_count, sample_K, 3))
        for sidx in range(self.shape_count):
            t = self.shape_type[sidx]
            sc = np.asarray(self.shape_scale[sidx], dtype=np.float64)
            src = self.shape_source[sidx]
            dense = None
            if t in mesh_types and isinstance(src, Mesh):
                dense = _mesh_surface_cloud(src.vertices * sc, src.indices)
            elif t == int(GeoType.HFIELD) and isinstance(src, Heightfield):
                hfv = np.asarray(src.heights, dtype=np.float64)
                nx, ny = hfv.shape
                dx = src.size_x / max(nx - 1, 1)
                dy = src.size_y / max(ny - 1, 1)
                gx, gy = np.meshgrid(
                    np.linspace(-src.size_x / 2, src.size_x / 2, nx),
                    np.linspace(-src.size_y / 2, src.size_y / 2, ny),
                    indexing="ij")
                pts = np.stack([gx, gy, hfv], axis=-1).reshape(-1, 3)
                # vector cell area dA*n = (-dh/dx, -dh/dy, 1) * dx*dy
                ddx = np.gradient(hfv, dx, axis=0)
                ddy = np.gradient(hfv, dy, axis=1)
                n = np.stack([-ddx, -ddy, np.ones_like(hfv)],
                             axis=-1).reshape(-1, 3)
                slope = np.linalg.norm(n, axis=1)
                dense = (pts, dx * dy * slope, n / slope[:, None])
            else:
                dense = _primitive_surface_cloud(GeoType(t), sc)
            if dense is not None and len(dense[0]):
                sample_areas[sidx] = _sample_area_weights(
                    sample_points[sidx], dense[0], dense[1], dense[2])
        # mean Voronoi cell area per shape (host metadata): hydroelastic
        # pairs integrate the pressure field over the FINER-sampled side
        # only (one iso-surface, like the reference's marching-cubes patch;
        # double integration would double-count and a coarse side's huge
        # cells would blow up small patches)
        st.shape_sample_cell_area = (
            np.linalg.norm(sample_areas, axis=-1).mean(axis=-1)
            if self.shape_count else np.zeros(0))

        # pool sparse SDF textures: block_index values become GLOBAL slots
        # into one shared blocks pool; textures with a smaller block grid
        # are padded by EXTENDING their domain upper bound (cell size kept
        # identical, added blocks resolve to the replicated coarse far
        # field), so the world->cell mapping stays exact per texture
        if sdf_texes:
            from ..geometry.sdf_texture import BLOCK as _TEX_BLOCK
            Bmax = max(t.block_index.shape[0] for t in sdf_texes)
            n_tex = len(sdf_texes)
            tex_index = np.full((n_tex, Bmax, Bmax, Bmax), -1, np.int32)
            tex_coarse = np.zeros((n_tex, Bmax + 1, Bmax + 1, Bmax + 1),
                                  np.float32)
            tex_lower = np.zeros((n_tex, 3))
            tex_upper = np.zeros((n_tex, 3))
            blocks_list, scale_list, offset_list = [], [], []
            off = 0
            for i, t in enumerate(sdf_texes):
                Bi = t.block_index.shape[0]
                bi = t.block_index.astype(np.int64)
                bi = np.where(bi >= 0, bi + off, -1)
                tex_index[i, :Bi, :Bi, :Bi] = bi
                c = t.coarse
                cp = np.pad(c, [(0, Bmax - Bi)] * 3, mode="edge")
                tex_coarse[i] = cp
                cell = (t.upper - t.lower) / (Bi * _TEX_BLOCK)
                tex_lower[i] = t.lower
                tex_upper[i] = t.lower + cell * (Bmax * _TEX_BLOCK)
                blocks_list.append(t.blocks[:len(t.block_scale)])
                scale_list.append(t.block_scale)
                offset_list.append(t.block_offset)
                off += len(t.block_scale)
            tex_blocks = np.concatenate(blocks_list, axis=0)
            tex_scale = np.concatenate(scale_list)
            tex_offset = np.concatenate(offset_list)
        else:
            tex_index = np.full((0, 2, 2, 2), -1, np.int32)
            tex_blocks = np.zeros((0, 9, 9, 9), np.uint8)
            tex_scale = np.zeros(0, np.float32)
            tex_offset = np.zeros(0, np.float32)
            tex_coarse = np.zeros((0, 3, 3, 3), np.float32)
            tex_lower = np.zeros((0, 3))
            tex_upper = np.zeros((0, 3))
        if sdf_grids:
            R = max(g.shape[0] for g in sdf_grids)
            pooled = np.zeros((len(sdf_grids), R, R, R), dtype=np.float32)
            for i, g0 in enumerate(sdf_grids):
                if g0.shape[0] != R:
                    # nearest upsample to the pool resolution
                    idx = (np.linspace(0, g0.shape[0] - 1, R)).astype(int)
                    g0 = g0[np.ix_(idx, idx, idx)]
                pooled[i] = g0
            sdf_pool = pooled
            sdf_lower_arr = np.stack(sdf_lowers)
            sdf_upper_arr = np.stack(sdf_uppers)
        else:
            sdf_pool = np.zeros((0, 2, 2, 2), dtype=np.float32)
            sdf_lower_arr = np.zeros((0, 3))
            sdf_upper_arr = np.zeros((0, 3))

        # collision candidates
        st.candidate_pairs, st.candidate_pair_slots, st.rigid_contact_max = (
            self._compute_candidate_pairs())
        # static slot -> shape/body maps (solvers index contacts without
        # dynamic gathers; slot addressing is build-time constant)
        slot_counts = np.diff(st.candidate_pair_slots)
        if len(st.candidate_pairs):
            slot_shape0 = np.repeat(st.candidate_pairs[:, 0],
                                    slot_counts).astype(np.int32)
            slot_shape1 = np.repeat(st.candidate_pairs[:, 1],
                                    slot_counts).astype(np.int32)
        else:
            slot_shape0 = np.full(st.rigid_contact_max, -1, dtype=np.int32)
            slot_shape1 = np.full(st.rigid_contact_max, -1, dtype=np.int32)
        st.slot_shape0 = slot_shape0
        st.slot_shape1 = slot_shape1
        sb = st.shape_body
        st.slot_body0 = np.where(slot_shape0 >= 0, sb[np.maximum(slot_shape0, 0)], -1).astype(np.int32)
        st.slot_body1 = np.where(slot_shape1 >= 0, sb[np.maximum(slot_shape1, 0)], -1).astype(np.int32)
        st.soft_pairs, st.soft_contact_max = self._compute_soft_pairs()
        st.shape_hull_verts = shape_hull_verts
        st.homogeneous, st.counts_per_world = self._detect_homogeneous()

        st.custom_specs = {name: a.spec() for name, a in self.custom_attributes.items()}

        # per-world gravity
        W = st.world_count
        if self.world_gravity:
            gravity = np.stack([np.asarray(g) for g in self.world_gravity], axis=0)
            if len(gravity) < W:
                pad = np.tile(self._gravity_vec(), (W - len(gravity), 1))
                gravity = np.concatenate([gravity, pad], axis=0)
        else:
            gravity = np.tile(self._gravity_vec(), (W, 1))

        def dev(x, dt=dtype):
            return jnp.asarray(np.asarray(x), dtype=dt)

        def dev_i(x):
            return jnp.asarray(np.asarray(x), dtype=jnp.int32)

        B, S, J = st.body_count, st.shape_count, st.joint_count
        D, Q, N = st.joint_dof_count, st.joint_coord_count, st.particle_count

        body_inertia = (np.stack(self.body_inertia) if B else np.zeros((0, 3, 3)))
        mass_arr = np.asarray(self.body_mass, dtype=np.float64)
        inv_mass = np.where(mass_arr > 0, 1.0 / np.maximum(mass_arr, 1e-30), 0.0)
        inv_inertia = np.zeros_like(body_inertia)
        if B:
            dets = np.linalg.det(body_inertia)
            ok = (mass_arr > 0) & (dets > 1e-18)
            safe = np.where(ok[:, None, None], body_inertia,
                            np.eye(3)[None])
            inv_all = np.linalg.inv(safe)
            inv_inertia = np.where(ok[:, None, None], inv_all, 0.0)
        kin = np.array([bool(f & int(BodyFlags.KINEMATIC)) for f in self.body_flags],
                       dtype=bool)
        inv_mass[kin] = 0.0
        inv_inertia[kin] = 0.0

        # custom attribute arrays
        custom: Dict[str, Any] = {}
        for name, attr in self.custom_attributes.items():
            n = {
                AttributeFrequency.BODY: B, AttributeFrequency.SHAPE: S,
                AttributeFrequency.JOINT: J, AttributeFrequency.JOINT_DOF: D,
                AttributeFrequency.JOINT_COORD: Q, AttributeFrequency.PARTICLE: N,
                AttributeFrequency.WORLD: W,
                AttributeFrequency.ARTICULATION: st.articulation_count,
                AttributeFrequency.EQUALITY: st.eq_count,
                AttributeFrequency.ONCE: 1,
            }[attr.frequency]
            # ONCE attributes are exactly their declared trailing shape (the
            # Model._alloc_custom convention); per-entity frequencies prepend
            # the entity count
            shape = (attr.shape if attr.frequency == AttributeFrequency.ONCE
                     else (n, *attr.shape))
            arr = np.full(shape, attr.default, dtype=attr.dtype)
            for k, v in attr.values.items():
                arr[k] = v
            custom[name] = jnp.asarray(arr)

        model = Model(
            body_q=dev(np.stack(self.body_q) if B else np.zeros((0, 7))),
            body_qd=dev(np.stack(self.body_qd) if B else np.zeros((0, 6))),
            body_com=dev(np.stack(self.body_com) if B else np.zeros((0, 3))),
            body_mass=dev(self.body_mass if B else np.zeros(0)),
            body_inv_mass=dev(inv_mass),
            body_inertia=dev(body_inertia),
            body_inv_inertia=dev(inv_inertia),
            body_flags=dev_i(self.body_flags if B else np.zeros(0)),
            shape_transform=dev(np.stack(self.shape_transform) if S else np.zeros((0, 7))),
            shape_body=dev_i(st.shape_body),
            shape_type=dev_i(st.shape_type),
            shape_scale=dev(np.stack(self.shape_scale) if S else np.zeros((0, 3))),
            shape_flags=dev_i(st.shape_flags),
            shape_thickness=dev(self.shape_thickness if S else np.zeros(0)),
            shape_collision_radius=dev([self._collision_radius(s) for s in range(S)] if S else np.zeros(0)),
            shape_material_mu=dev(self.shape_material_mu if S else np.zeros(0)),
            shape_material_restitution=dev(self.shape_material_restitution if S else np.zeros(0)),
            shape_material_ke=dev(self.shape_material_ke if S else np.zeros(0)),
            shape_material_kd=dev(self.shape_material_kd if S else np.zeros(0)),
            shape_material_kf=dev(self.shape_material_kf if S else np.zeros(0)),
            shape_material_kh=dev(self.shape_material_kh if S else np.zeros(0)),
            shape_world=dev_i(st.shape_world),
            shape_source=dev_i(shape_source_idx),
            joint_type_arr=dev_i(st.joint_type),
            joint_parent=dev_i(st.joint_parent),
            joint_child=dev_i(st.joint_child),
            joint_X_p=dev(np.stack(self.joint_X_p) if J else np.zeros((0, 7))),
            joint_X_c=dev(np.stack(self.joint_X_c) if J else np.zeros((0, 7))),
            joint_enabled=jnp.asarray(np.asarray(self.joint_enabled, dtype=bool) if J else np.zeros(0, dtype=bool)),
            joint_axis=dev(np.stack(self.joint_axis) if D else np.zeros((0, 3))),
            joint_armature=dev(self.joint_armature if D else np.zeros(0)),
            joint_target_ke=dev(self.joint_target_ke if D else np.zeros(0)),
            joint_target_kd=dev(self.joint_target_kd if D else np.zeros(0)),
            joint_limit_lower=dev(self.joint_limit_lower if D else np.zeros(0)),
            joint_limit_upper=dev(self.joint_limit_upper if D else np.zeros(0)),
            joint_limit_ke=dev(self.joint_limit_ke if D else np.zeros(0)),
            joint_limit_kd=dev(self.joint_limit_kd if D else np.zeros(0)),
            joint_friction=dev(self.joint_friction if D else np.zeros(0)),
            joint_effort_limit=dev(self.joint_effort_limit if D else np.zeros(0)),
            joint_velocity_limit=dev(self.joint_velocity_limit if D else np.zeros(0)),
            joint_qd0=dev(self.joint_qd if D else np.zeros(0)),
            joint_q0=dev(self.joint_q if Q else np.zeros(0)),
            joint_target_q0=dev(self.joint_target_q if Q else np.zeros(0)),
            eq_obj1=dev_i(self.eq_obj1 if st.eq_count else np.zeros(0)),
            eq_obj2=dev_i(self.eq_obj2 if st.eq_count else np.zeros(0)),
            eq_anchor=dev(np.stack(self.eq_anchor) if st.eq_count else np.zeros((0, 3))),
            eq_relpose=dev(np.stack(self.eq_relpose) if st.eq_count else np.zeros((0, 7))),
            eq_polycoef=dev(np.stack(self.eq_polycoef) if st.eq_count else np.zeros((0, 5))),
            eq_enabled=jnp.asarray(np.asarray(self.eq_enabled, dtype=bool) if st.eq_count else np.zeros(0, dtype=bool)),
            eq_torquescale=dev(self.eq_torquescale if st.eq_count else np.zeros(0)),
            particle_q=dev(np.stack(self.particle_q) if N else np.zeros((0, 3))),
            particle_qd=dev(np.stack(self.particle_qd) if N else np.zeros((0, 3))),
            particle_mass=dev(self.particle_mass if N else np.zeros(0)),
            particle_inv_mass=dev([1.0 / m if m > 0 else 0.0 for m in self.particle_mass] if N else np.zeros(0)),
            particle_radius=dev(self.particle_radius if N else np.zeros(0)),
            particle_flags=dev_i(self.particle_flags if N else np.zeros(0)),
            spring_indices=dev_i(np.asarray(self.spring_indices, dtype=np.int32).reshape(-1, 2)),
            spring_rest_length=dev(self.spring_rest_length if self.spring_count else np.zeros(0)),
            spring_stiffness=dev(self.spring_stiffness if self.spring_count else np.zeros(0)),
            spring_damping=dev(self.spring_damping if self.spring_count else np.zeros(0)),
            tri_indices=dev_i(np.asarray(self.tri_indices, dtype=np.int32).reshape(-1, 3)),
            tri_poses=dev(np.stack(self.tri_poses) if self.tri_count else np.zeros((0, 2, 2))),
            tri_materials=dev(np.asarray(self.tri_materials).reshape(-1, 5)),
            tri_areas=dev(self.tri_areas if self.tri_count else np.zeros(0)),
            edge_indices=dev_i(np.asarray(self.edge_indices, dtype=np.int32).reshape(-1, 4)),
            edge_rest_angle=dev(self.edge_rest_angle if self.edge_count else np.zeros(0)),
            edge_rest_length=dev(self.edge_rest_length if self.edge_count else np.zeros(0)),
            edge_bending_properties=dev(np.asarray(self.edge_bending_properties).reshape(-1, 2)),
            tet_indices=dev_i(np.asarray(self.tet_indices, dtype=np.int32).reshape(-1, 4)),
            tet_poses=dev(np.stack(self.tet_poses) if self.tet_count else np.zeros((0, 3, 3))),
            tet_materials=dev(np.asarray(self.tet_materials).reshape(-1, 3)),
            tendon_params=dev(np.asarray(self.tendon_params).reshape(-1, 3)),
            sten_params=dev(sten_params),
            muscle_params=dev(np.asarray(self.muscle_params).reshape(-1, 7)),
            muscle_bodies=dev_i(np.asarray(self.muscle_bodies, dtype=np.int32)),
            muscle_points=dev(np.asarray(self.muscle_points).reshape(-1, 3)),
            mesh_points=dev(mesh_points),
            mesh_indices=dev_i(mesh_indices),
            shape_sample_points=dev(sample_points),
            shape_sample_areas=dev(sample_areas),
            sdf_grids=dev(sdf_pool),
            sdf_lower=dev(sdf_lower_arr),
            sdf_upper=dev(sdf_upper_arr),
            sdf_tex_block_index=dev_i(tex_index),
            sdf_tex_blocks=jnp.asarray(tex_blocks, dtype=jnp.uint8),
            sdf_tex_scale=dev(tex_scale),
            sdf_tex_offset=dev(tex_offset),
            sdf_tex_coarse=dev(tex_coarse),
            sdf_tex_lower=dev(tex_lower),
            sdf_tex_upper=dev(tex_upper),
            gravity=dev(gravity),
            particle_ke=dev(self.particle_ke), particle_kd=dev(self.particle_kd),
            particle_kf=dev(self.particle_kf), particle_mu=dev(self.particle_mu),
            particle_cohesion=dev(self.particle_cohesion),
            particle_adhesion=dev(self.particle_adhesion),
            particle_max_velocity=dev(self.particle_max_velocity),
            soft_contact_ke=dev(self.soft_contact_ke),
            soft_contact_kd=dev(self.soft_contact_kd),
            soft_contact_kf=dev(self.soft_contact_kf),
            soft_contact_mu=dev(self.soft_contact_mu),
            soft_contact_margin=dev(self.soft_contact_margin),
            custom=custom,
            structure=st,
        )
        if device is not None:
            model = jax.device_put(model, device)
        return model


    def approximate_meshes(self, method: str = "convex_hull",
                           maxhullvert: int = 64) -> None:
        """Replace mesh collision sources with convex approximations
        (reference: builder.py:7270 — the reference uses coacd convex
        decomposition; without that dependency each mesh becomes its
        convex hull)."""
        for s_i, src in enumerate(self.shape_source):
            if isinstance(src, Mesh) and self.shape_type[s_i] == int(GeoType.MESH):
                hull = _convex_hull_mesh(src)
                hull.maxhullvert = maxhullvert
                self.shape_source[s_i] = hull
                self.shape_type[s_i] = int(GeoType.CONVEX)

    def plot_articulation(self, articulation: int = 0) -> str:
        """Text tree of an articulation's kinematic structure
        (reference: builder.py:5355 renders a graph; this returns an
        indented tree for terminals/logs)."""
        lines = []
        start = self.articulation_start[articulation]
        end = (self.articulation_start[articulation + 1]
               if articulation + 1 < len(self.articulation_start)
               else self.joint_count)
        children: Dict[int, List[int]] = {}
        roots = []
        for j in range(start, end):
            p = self.joint_parent[j]
            children.setdefault(p, []).append(j)
        for j in children.get(-1, []):
            roots.append(j)

        def walk(j, depth):
            t = JointType(self.joint_type[j]).name
            child = self.joint_child[j]
            lines.append("  " * depth
                         + f"{self.joint_key[j]} [{t}] -> "
                         + f"{self.body_key[child]}")
            for j2 in range(start, end):
                if self.joint_parent[j2] == child:
                    walk(j2, depth + 1)

        for r in roots:
            walk(r, 0)
        return "\n".join(lines)

    def add_rod(self, start_pos, end_pos, segments: int = 8,
                radius: float = 0.02, density: float = 1000.0,
                bend_ke: float = 100.0, bend_kd: float = 1.0,
                root_joint: str = "free", root_parent: int = -1,
                joint: str = "ball",
                stretch_ke: float = 1.0e5, stretch_kd: float = 0.0,
                twist_ke: Optional[float] = None,
                twist_kd: Optional[float] = None,
                key: Optional[str] = None) -> List[int]:
        """Discrete elastic rod as a capsule chain (reference: builder.py:7632
        add_rod). ``joint="ball"`` links segments with compliant ball joints
        (bend via dof drive gains, usable by every rigid solver);
        ``joint="cable"`` links them with CABLE joints carrying the
        reference's split stretch/shear/bend/twist Cosserat stiffness
        (solved by SolverXPBD/SolverVBD; ``twist_ke`` defaults to
        ``bend_ke``). Segment +Z is the material tangent either way.
        Returns the body indices."""
        p0 = np.asarray(start_pos, dtype=np.float64)
        p1 = np.asarray(end_pos, dtype=np.float64)
        axis = p1 - p0
        length = float(np.linalg.norm(axis))
        axis = axis / max(length, 1e-9)
        seg_len = length / segments
        q = np_quat_between_axes(np.array([0.0, 0, 1]), axis)
        bodies = []
        cfg = self.default_shape_cfg.copy()
        cfg.density = density
        prev = -1
        for i in range(segments):
            center = p0 + axis * (i + 0.5) * seg_len
            b = self.add_body(xform=np_transform(center, q),
                              key=(key or "rod") + f"_{i}")
            self.add_shape_capsule(b, radius=radius,
                                   half_height=seg_len / 2 - radius * 0.5,
                                   cfg=cfg, key=(key or "rod") + f"_shape_{i}")
            if i == 0:
                if root_joint == "fixed":
                    self.add_joint_fixed(
                        root_parent, b,
                        xform_p=np_transform(p0, q) if root_parent < 0
                        else np_transform(np.array([0.0, 0, 0]), q),
                        xform_c=np_transform(np.array([0.0, 0, -seg_len / 2])),
                        key=(key or "rod") + "_root")
                elif root_joint == "ball":
                    j = self.add_joint_ball(
                        root_parent, b,
                        xform_p=np_transform(p0, q) if root_parent < 0
                        else np_transform(np.array([0.0, 0, 0]), q),
                        xform_c=np_transform(np.array([0.0, 0, -seg_len / 2])),
                        key=(key or "rod") + "_root")
                    d0 = self.joint_qd_start[j]
                    for k in range(3):
                        self.joint_target_ke[d0 + k] = bend_ke
                        self.joint_target_kd[d0 + k] = bend_kd
                else:
                    self.add_joint_free(b, key=(key or "rod") + "_root")
            else:
                anchor_p = np_transform(np.array([0.0, 0, seg_len / 2]))
                anchor_c = np_transform(np.array([0.0, 0, -seg_len / 2]))
                if joint == "cable":
                    self.add_joint_cable(
                        prev, b, xform_p=anchor_p, xform_c=anchor_c,
                        stretch_stiffness=stretch_ke,
                        stretch_damping=stretch_kd,
                        bend_stiffness=bend_ke, bend_damping=bend_kd,
                        twist_stiffness=twist_ke, twist_damping=twist_kd,
                        key=(key or "rod") + f"_j{i}")
                else:
                    j = self.add_joint_ball(prev, b, xform_p=anchor_p,
                                            xform_c=anchor_c,
                                            key=(key or "rod") + f"_j{i}")
                    # bending stiffness via the dof drive gains
                    d0 = self.joint_qd_start[j]
                    for k in range(3):
                        self.joint_target_ke[d0 + k] = bend_ke
                        self.joint_target_kd[d0 + k] = bend_kd
            prev = b
            bodies.append(b)
        return bodies

    def add_rod_graph(self, points, edges, radius: float = 0.02,
                      density: float = 1000.0, bend_ke: float = 100.0,
                      bend_kd: float = 1.0, joint: str = "ball",
                      stretch_ke: float = 1.0e5, stretch_kd: float = 0.0,
                      twist_ke: Optional[float] = None,
                      twist_kd: Optional[float] = None,
                      key: Optional[str] = None) -> List[int]:
        """Branching rod network: one capsule body per edge, compliant ball
        joints — or, with ``joint="cable"``, split-stiffness CABLE joints —
        where edges share a point (reference: builder.py:7861
        add_rod_graph). ``points`` is (P, 3); ``edges`` is a list of (i, j)
        point-index pairs forming a tree (first edge's start point is the
        free root). Returns the per-edge body indices."""
        pts = np.asarray(points, dtype=np.float64)
        cfg = self.default_shape_cfg.copy()
        cfg.density = density
        point_body = {}          # point index -> (body, local offset end)
        body_rot = {}            # body -> world quat at build
        bodies = []
        for ei, (i, j) in enumerate(edges):
            p0, p1 = pts[int(i)], pts[int(j)]
            axis = p1 - p0
            length = float(np.linalg.norm(axis))
            axis = axis / max(length, 1e-9)
            q = np_quat_between_axes(np.array([0.0, 0, 1]), axis)
            center = (p0 + p1) / 2
            b = self.add_body(xform=np_transform(center, q),
                              key=(key or "rodg") + f"_{ei}")
            body_rot[b] = q
            self.add_shape_capsule(b, radius=radius,
                                   half_height=max(length / 2 - radius * 0.5,
                                                   radius * 0.25),
                                   cfg=cfg,
                                   key=(key or "rodg") + f"_shape_{ei}")
            if int(i) in point_body:
                parent, off = point_body[int(i)]
                if joint == "cable":
                    # rest-pose-anchored child frame: at build the child
                    # anchor's rotation matches the parent anchor, so the
                    # branch angle is the zero-strain configuration
                    q_par = body_rot[parent]
                    q_conj = np.array([-q[0], -q[1], -q[2], q[3]])
                    q_cl = np_quat_mul(q_conj, q_par)
                    self.add_joint_cable(
                        parent, b, xform_p=np_transform(off),
                        xform_c=np_transform(
                            np.array([0.0, 0, -length / 2]), q_cl),
                        stretch_stiffness=stretch_ke,
                        stretch_damping=stretch_kd,
                        bend_stiffness=bend_ke, bend_damping=bend_kd,
                        twist_stiffness=twist_ke, twist_damping=twist_kd,
                        key=(key or "rodg") + f"_j{ei}")
                else:
                    jt = self.add_joint_ball(
                        parent, b, xform_p=np_transform(off),
                        xform_c=np_transform(np.array([0.0, 0, -length / 2])),
                        key=(key or "rodg") + f"_j{ei}")
                    d0 = self.joint_qd_start[jt]
                    for k in range(3):
                        self.joint_target_ke[d0 + k] = bend_ke
                        self.joint_target_kd[d0 + k] = bend_kd
            else:
                self.add_joint_free(b, key=(key or "rodg") + f"_root{ei}")
            # register both endpoints in this body's local frame (z-aligned)
            if int(i) not in point_body:
                point_body[int(i)] = (b, np.array([0.0, 0, -length / 2]))
            point_body[int(j)] = (b, np.array([0.0, 0, length / 2]))
            bodies.append(b)
        return bodies

    def color(self, include_bending: bool = True,
              balance_colors: bool = True):
        """Color the particle constraint graph for parallel Gauss-Seidel
        solvers (reference: builder.py:10131 -> sim/graph_coloring.py:243).
        Returns per-color particle index arrays."""
        from .graph_coloring import ColoringAlgorithm, color_graph
        edges = []
        edges += [(a, b) for a, b in self.spring_indices]
        for a, b, c in self.tri_indices:
            edges += [(a, b), (b, c), (c, a)]
        if include_bending:
            for e in self.edge_indices:
                if e[0] >= 0 and e[1] >= 0:
                    edges.append((e[0], e[1]))
        for t in self.tet_indices:
            for i in range(4):
                for j in range(i + 1, 4):
                    edges.append((t[i], t[j]))
        return color_graph(self.particle_count, np.asarray(edges or [[0, 0]]),
                           ColoringAlgorithm.MCS, balance_colors)

    def collapse_fixed_joints(self) -> None:
        """Merge fixed-jointed bodies into their parents
        (reference: builder.py:5493)."""
        _collapse_fixed_joints(self)

    # ------------------------------------------------------------------
    # importers (reference: builder.py:3184 add_urdf, :3615 add_mjcf)
    # ------------------------------------------------------------------
    def add_mjcf(self, source: str, xform=None, floating: Optional[bool] = None,
                 scale: float = 1.0, key_prefix: Optional[str] = None, **kwargs):
        """Import a MuJoCo MJCF file/string (reference: builder.py:3615)."""
        from ..utils.import_mjcf import parse_mjcf
        return parse_mjcf(self, source, xform=xform, floating=floating,
                          scale=scale, key_prefix=key_prefix, **kwargs)

    def add_usd(self, source: str, xform=None, floating: bool = False,
                scale: float = 1.0, key_prefix: Optional[str] = None,
                **kwargs):
        """Import a USD (.usda text) stage (reference: builder.py:3330)."""
        from ..utils.import_usd import parse_usd
        return parse_usd(self, source, xform=xform, floating=floating,
                         scale=scale, key_prefix=key_prefix, **kwargs)

    def add_urdf(self, source: str, xform=None, floating: bool = False,
                 scale: float = 1.0, key_prefix: Optional[str] = None, **kwargs):
        """Import a URDF file/string (reference: builder.py:3184)."""
        from ..utils.import_urdf import parse_urdf
        return parse_urdf(self, source, xform=xform, floating=floating,
                          scale=scale, key_prefix=key_prefix, **kwargs)


def _convex_hull_mesh(mesh: Mesh) -> Mesh:
    """Host-side convex hull (gift-wrapping via scipy-free incremental hull).

    Falls back to the original mesh when hull construction fails.
    """
    try:
        pts = np.unique(mesh.vertices, axis=0)
        if len(pts) < 4:
            return mesh
        hull_idx = _quickhull(pts, mesh.maxhullvert)
        verts = pts[sorted(set(hull_idx.flatten()))]
        remap = {v: i for i, v in enumerate(sorted(set(hull_idx.flatten())))}
        faces = np.vectorize(remap.get)(hull_idx)
        return Mesh(verts, faces.reshape(-1), is_solid=True,
                    maxhullvert=mesh.maxhullvert)
    except Exception:
        return mesh


def _quickhull(pts: np.ndarray, max_verts: int = 64) -> np.ndarray:
    """Minimal 3D quickhull returning (F, 3) face indices into pts."""
    n = len(pts)
    # initial simplex: extreme points
    i0 = int(np.argmin(pts[:, 0])); i1 = int(np.argmax(pts[:, 0]))
    d = np.linalg.norm(np.cross(pts - pts[i0], pts[i1] - pts[i0]), axis=1)
    i2 = int(np.argmax(d))
    nrm = np.cross(pts[i1] - pts[i0], pts[i2] - pts[i0])
    d = np.abs((pts - pts[i0]) @ nrm)
    i3 = int(np.argmax(d))
    if d[i3] < 1e-12:
        raise ValueError("degenerate point set")
    faces = [(i0, i1, i2), (i0, i2, i3), (i0, i3, i1), (i1, i3, i2)]
    centroid = pts[[i0, i1, i2, i3]].mean(axis=0)

    def orient(f):
        a, b, c = f
        nn = np.cross(pts[b] - pts[a], pts[c] - pts[a])
        if nn @ (centroid - pts[a]) > 0:
            return (a, c, b)
        return f

    faces = [orient(f) for f in faces]
    for _ in range(4 * n):
        grew = False
        for fi, (a, b, c) in enumerate(list(faces)):
            nn = np.cross(pts[b] - pts[a], pts[c] - pts[a])
            ln = np.linalg.norm(nn)
            if ln < 1e-15:
                continue
            nn = nn / ln
            dist = (pts - pts[a]) @ nn
            far = int(np.argmax(dist))
            if dist[far] <= 1e-10:
                continue
            # remove all faces visible from `far`, collect horizon edges
            visible = []
            for gi, (p, q, r) in enumerate(faces):
                m = np.cross(pts[q] - pts[p], pts[r] - pts[p])
                if (pts[far] - pts[p]) @ m > 1e-12:
                    visible.append(gi)
            edge_count: Dict[Tuple[int, int], int] = {}
            for gi in visible:
                p, q, r = faces[gi]
                for e in ((p, q), (q, r), (r, p)):
                    kk = (min(e), max(e))
                    edge_count[kk] = edge_count.get(kk, 0) + 1
            horizon = []
            for gi in visible:
                p, q, r = faces[gi]
                for e in ((p, q), (q, r), (r, p)):
                    kk = (min(e), max(e))
                    if edge_count[kk] == 1:
                        horizon.append(e)
            faces = [f for gi, f in enumerate(faces) if gi not in set(visible)]
            for (p, q) in horizon:
                faces.append(orient((p, q, far)))
            grew = True
            break
        if not grew:
            break
        if len(set(i for f in faces for i in f)) >= max_verts:
            break
    return np.asarray(faces, dtype=np.int64)


def _surface_sample_candidates(verts: np.ndarray,
                               indices: np.ndarray) -> np.ndarray:
    """Contact-sample candidates covering a mesh SURFACE, not just its
    vertices: triangle edge midpoints, centroids and interior points are
    added so low-poly meshes (a box is 8 verts) still get face-interior
    contacts. Large meshes contribute their biggest triangles only."""
    verts = np.asarray(verts, dtype=np.float64)
    faces = np.asarray(indices, dtype=np.int64).reshape(-1, 3)
    if len(faces) == 0:
        return verts
    tri = verts[faces]                                     # (T, 3, 3)
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    order = np.argsort(-area)[:2048]                       # cap host cost
    tri = tri[order]
    mids = 0.5 * (tri + np.roll(tri, -1, axis=1))          # edge midpoints
    cent = tri.mean(axis=1, keepdims=True)                 # centroids
    interior = 0.5 * (tri + cent)                          # toward-center pts
    return np.concatenate([verts, mids.reshape(-1, 3), cent.reshape(-1, 3),
                           interior.reshape(-1, 3)])


def _feature_edge_seeds(verts: np.ndarray, indices: np.ndarray,
                        max_seeds: int) -> np.ndarray:
    """Priority contact samples on sharp feature edges, with redundant
    parallel edges culled (geometry/edge_redundancy.py; reference
    edge_redundancy.py:33 + types.py:961 _build_collision_edges). Seeding
    FPS with these guarantees real features (box rims, bevels' survivors)
    keep contact coverage on coarse sample budgets."""
    from ..geometry.edge_redundancy import collision_edges
    verts = np.asarray(verts, dtype=np.float64)
    try:
        ce = collision_edges(verts, indices)
    except Exception:
        return np.zeros((0, 3))
    if len(ce) == 0:
        return np.zeros((0, 3))
    a, b = verts[ce[:, 0]], verts[ce[:, 1]]
    if len(ce) > max_seeds:                   # longest edges first
        order = np.argsort(-np.linalg.norm(b - a, axis=1))[:max_seeds]
        a, b = a[order], b[order]
    return np.concatenate([a, b, 0.5 * (a + b)])


def _fps_sample(points: np.ndarray, k: int,
                seeds: Optional[np.ndarray] = None) -> np.ndarray:
    """Farthest-point sampling of contact candidates from mesh vertices.
    ``seeds`` are chosen first (deduplicated, capped at k) so feature-edge
    points always survive the downsample."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    n = len(pts)
    if n == 0:
        return np.zeros((k, 3))
    if n <= k:
        return np.concatenate([pts, np.repeat(pts[-1:], k - n, axis=0)])
    if seeds is not None and len(seeds):
        sd = np.unique(np.asarray(seeds, dtype=np.float64), axis=0)
        if len(sd) > k:
            sd = _fps_sample(sd, k)
        d = np.linalg.norm(pts[:, None, :] - sd[None, :, :], axis=-1).min(1)
        chosen: List[int] = []
        for _ in range(k - len(sd)):
            i = int(np.argmax(d))
            chosen.append(i)
            d = np.minimum(d, np.linalg.norm(pts - pts[i], axis=1))
        return np.concatenate([sd, pts[chosen]]) if chosen else sd
    chosen = [int(np.argmax(np.linalg.norm(pts - pts.mean(0), axis=1)))]
    d = np.linalg.norm(pts - pts[chosen[0]], axis=1)
    for _ in range(k - 1):
        i = int(np.argmax(d))
        chosen.append(i)
        d = np.minimum(d, np.linalg.norm(pts - pts[i], axis=1))
    return pts[chosen]


def _primitive_sample_points(t: GeoType, sc, k: int) -> np.ndarray:
    """Surface sample points for primitive shapes (used when a primitive
    samples into a mesh SDF — the reverse mesh-contact direction)."""
    pts: List[np.ndarray] = []
    if t == GeoType.SPHERE or t == GeoType.ELLIPSOID:
        r = sc if t == GeoType.ELLIPSOID else np.array([sc[0]] * 3)
        dirs = np.array([[1,0,0],[-1,0,0],[0,1,0],[0,-1,0],[0,0,1],[0,0,-1],
                         [1,1,1],[1,1,-1],[1,-1,1],[1,-1,-1],
                         [-1,1,1],[-1,1,-1],[-1,-1,1],[-1,-1,-1]], dtype=float)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        pts = list(dirs * r)
    elif t == GeoType.BOX:
        pts = [np.array([sx*sc[0], sy*sc[1], sz*sc[2]])
               for sx in (-1,1) for sy in (-1,1) for sz in (-1,1)]
        pts += [np.array([s_*sc[0],0,0]) for s_ in (-1,1)]
        pts += [np.array([0,s_*sc[1],0]) for s_ in (-1,1)]
        pts += [np.array([0,0,s_*sc[2]]) for s_ in (-1,1)]
    elif t in (GeoType.CAPSULE, GeoType.CYLINDER, GeoType.CONE):
        r, h = sc[0], sc[1]
        for z in (-h - (r if t == GeoType.CAPSULE else 0),
                  h + (r if t == GeoType.CAPSULE else 0)):
            pts.append(np.array([0, 0, z]))
        for z in (-h, 0.0, h):
            for a_ in np.linspace(0, 2*np.pi, 5)[:-1]:
                pts.append(np.array([r*np.cos(a_), r*np.sin(a_), z]))
    out = np.zeros((k, 3))
    n = min(len(pts), k)
    if n:
        out[:n] = np.stack(pts[:n])
        out[n:] = out[0]
    return out


def _sample_area_weights(samples: np.ndarray, dense_pts: np.ndarray,
                         dense_areas: np.ndarray,
                         dense_normals: np.ndarray) -> np.ndarray:
    """Voronoi partition of a dense surface cloud over the contact samples:
    each dense element's VECTOR area (dA * outward normal) accrues to its
    nearest sample, giving per-sample vector areas v_i = sum(dA_j n_j).
    Projecting v_i onto a contact direction yields exactly the projected
    patch area (divergence theorem), so flat-on-flat hydroelastic force
    integrals are exact and side-face slices assigned to edge/corner
    samples contribute nothing in the normal direction. Total vector area
    is conserved; padded duplicate samples receive the shared cell once
    (argmin picks the first)."""
    d = np.linalg.norm(dense_pts[:, None, :] - samples[None, :, :], axis=-1)
    nearest = np.argmin(d, axis=1)
    w = np.zeros((len(samples), 3))
    np.add.at(w, nearest, dense_normals * dense_areas[:, None])
    return w


def _mesh_surface_cloud(verts: np.ndarray, indices: np.ndarray) -> Tuple[
        np.ndarray, np.ndarray, np.ndarray]:
    """Dense (points, areas, outward normals) covering a mesh surface: each
    triangle is split into 4 (edge-midpoint subdivision) and contributes
    its sub-centroids with a quarter of its area — finer than per-triangle
    centroids so the Voronoi partition doesn't lump big faces onto one
    sample."""
    verts = np.asarray(verts, dtype=np.float64)
    faces = np.asarray(indices, dtype=np.int64).reshape(-1, 3)
    if len(faces) == 0:
        return np.zeros((0, 3)), np.zeros((0,)), np.zeros((0, 3))
    tri = verts[faces]                                     # (T, 3, 3)
    nvec = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(nvec, axis=1)
    nrm = nvec / np.maximum(np.linalg.norm(nvec, axis=1, keepdims=True),
                            1e-30)
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
    ab, bc, ca = 0.5 * (a + b), 0.5 * (b + c), 0.5 * (c + a)
    subs = [(a, ab, ca), (ab, b, bc), (ca, bc, c), (ab, bc, ca)]
    pts = np.concatenate([(p + q + r) / 3.0 for p, q, r in subs])
    areas = np.tile(area / 4.0, 4)
    return pts, areas, np.tile(nrm, (4, 1))


def _fibonacci_sphere(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5 ** 0.5) * i
    return np.stack([np.cos(theta) * np.sin(phi),
                     np.sin(theta) * np.sin(phi), np.cos(phi)], axis=-1)


def _primitive_surface_cloud(t: GeoType, sc) -> Optional[
        Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Dense (points, areas, outward normals) on a primitive's surface for
    the hydroelastic area partition. Exact total area for
    sphere/box/capsule/cylinder; first-fundamental-form scaling for the
    ellipsoid."""
    sc = np.asarray(sc, dtype=np.float64)
    if t == GeoType.SPHERE:
        r = sc[0]
        u = _fibonacci_sphere(256)
        return u * r, np.full(256, 4.0 * np.pi * r * r / 256), u
    if t == GeoType.ELLIPSOID:
        u = _fibonacci_sphere(256)
        # linear map A = diag(sc): dA -> det(A) * |A^-T n| dA_unit
        scale = np.prod(sc) * np.sqrt(((u / sc[None, :]) ** 2).sum(-1))
        n = u / sc[None, :]
        n = n / np.linalg.norm(n, axis=1, keepdims=True)
        return u * sc[None, :], (4.0 * np.pi / 256) * scale, n
    if t == GeoType.BOX:
        pts, areas, nrms = [], [], []
        g = (np.arange(4) + 0.5) / 4.0 * 2.0 - 1.0         # 4 cells per axis
        for ax in range(3):
            o1, o2 = (ax + 1) % 3, (ax + 2) % 3
            face_area = 4.0 * sc[o1] * sc[o2] / 16.0
            for s in (-1.0, 1.0):
                n = np.zeros(3)
                n[ax] = s
                for u_ in g:
                    for v_ in g:
                        p = np.zeros(3)
                        p[ax] = s * sc[ax]
                        p[o1] = u_ * sc[o1]
                        p[o2] = v_ * sc[o2]
                        pts.append(p)
                        areas.append(face_area)
                        nrms.append(n)
        return np.stack(pts), np.asarray(areas), np.stack(nrms)
    if t in (GeoType.CAPSULE, GeoType.CYLINDER, GeoType.CONE):
        r, h = sc[0], sc[1]
        pts, areas, nrms = [], [], []
        nth, nz = 12, 6
        ths = np.linspace(0, 2 * np.pi, nth, endpoint=False)
        side_h = 2.0 * h
        if t == GeoType.CONE:
            # lateral surface of the cone z in [-h, h], apex at +h
            slant = np.sqrt(side_h ** 2 + r ** 2)
            lat = np.pi * r * slant
            for th in ths:
                ct, st_ = np.cos(th), np.sin(th)
                n = np.array([ct * side_h, st_ * side_h, r]) / slant
                for zf in (np.arange(nz) + 0.5) / nz:
                    z = -h + zf * side_h
                    rr = r * (1.0 - zf)
                    pts.append([rr * ct, rr * st_, z])
                    # annulus weighting ~ local radius
                    areas.append(lat * (1.0 - zf))
                    nrms.append(n)
            areas = list(np.asarray(areas) / np.sum(areas) * lat)
            # base disk
            for th in ths:
                for rf in ((np.arange(3) + 0.5) / 3.0):
                    pts.append([r * rf * np.cos(th), r * rf * np.sin(th), -h])
                    areas.append(np.pi * r * r * rf)
                    nrms.append([0.0, 0.0, -1.0])
            a = np.asarray(areas)
            disk = np.pi * r * r
            a[-nth * 3:] = a[-nth * 3:] / a[-nth * 3:].sum() * disk
            return np.asarray(pts), a, np.asarray(nrms)
        # cylinder side (also the capsule's)
        for th in ths:
            ct, st_ = np.cos(th), np.sin(th)
            for zf in (np.arange(nz) + 0.5) / nz:
                z = -h + zf * side_h
                pts.append([r * ct, r * st_, z])
                areas.append(2 * np.pi * r * side_h / (nth * nz))
                nrms.append([ct, st_, 0.0])
        if t == GeoType.CAPSULE:
            u = _fibonacci_sphere(128)
            cap_a = 4.0 * np.pi * r * r / 128
            for ui in u:
                z_off = h if ui[2] >= 0 else -h
                pts.append([ui[0] * r, ui[1] * r, ui[2] * r + z_off])
                areas.append(cap_a)
                nrms.append(ui)
        else:                                               # cylinder caps
            for th in ths:
                for rf in ((np.arange(3) + 0.5) / 3.0):
                    for s in (-1.0, 1.0):
                        pts.append([r * rf * np.cos(th),
                                    r * rf * np.sin(th), s * h])
                        areas.append(2 * np.pi * r * r / (nth * 3 * 2) * rf
                                     * 2)
                        nrms.append([0.0, 0.0, s])
            a = np.asarray(areas)
            n_cap = nth * 3 * 2
            a[-n_cap:] = a[-n_cap:] / a[-n_cap:].sum() * 2 * np.pi * r * r
            return np.asarray(pts), a, np.asarray(nrms)
        return np.asarray(pts), np.asarray(areas), np.asarray(nrms)
    return None


def _collapse_fixed_joints(builder: "ModelBuilder") -> Dict[int, int]:
    """Merge bodies connected by FIXED joints into their parents
    (reference: builder.py:5493 collapse_fixed_joints). Returns the
    old->new body index map. Bodies fixed to the world (-1) are kept.
    Mutates the builder in place; call before finalize().
    """
    from ..core.host_math import np_quat_to_matrix

    # repeat until no collapsible joint remains (chains of fixed joints)
    while True:
        target = None
        for j in range(builder.joint_count):
            if (builder.joint_type[j] == int(JointType.FIXED)
                    and builder.joint_parent[j] >= 0):
                target = j
                break
        if target is None:
            break
        j = target
        parent = builder.joint_parent[j]
        child = builder.joint_child[j]
        # child-frame -> parent-frame transform through the joint
        X_pc = np_transform_multiply(
            builder.joint_X_p[j], np_transform_inverse(builder.joint_X_c[j]))

        # merge mass properties
        m_c = builder.body_mass[child]
        if m_c > 0:
            com_c_in_p = np_transform_point(X_pc, builder.body_com[child])
            R = np_quat_to_matrix(X_pc[3:])
            I_c_in_p = R @ builder.body_inertia[child] @ R.T
            m_p = builder.body_mass[parent]
            c_p = builder.body_com[parent]
            m_new = m_p + m_c
            c_new = (m_p * c_p + m_c * com_c_in_p) / m_new
            I_p_s = transform_inertia(m_p, builder.body_inertia[parent],
                                      c_p - c_new, np.array([0., 0, 0, 1]))
            I_c_s = transform_inertia(m_c, I_c_in_p,
                                      com_c_in_p - c_new,
                                      np.array([0., 0, 0, 1]))
            builder.body_mass[parent] = m_new
            builder.body_com[parent] = c_new
            builder.body_inertia[parent] = I_p_s + I_c_s

        # re-parent child's shapes
        for s in range(builder.shape_count):
            if builder.shape_body[s] == child:
                builder.shape_body[s] = parent
                builder.shape_transform[s] = np_transform_multiply(
                    X_pc, builder.shape_transform[s])

        # re-root child's outgoing joints
        for j2 in range(builder.joint_count):
            if j2 == j:
                continue
            if builder.joint_parent[j2] == child:
                builder.joint_parent[j2] = parent
                builder.joint_X_p[j2] = np_transform_multiply(
                    X_pc, builder.joint_X_p[j2])
            if builder.joint_child[j2] == child:
                builder.joint_child[j2] = parent
                builder.joint_X_c[j2] = np_transform_multiply(
                    X_pc, builder.joint_X_c[j2])

        # remap equality constraints (body-typed)
        for e in range(len(builder.eq_type)):
            if EqType(builder.eq_type[e]) != EqType.JOINT:
                if builder.eq_obj1[e] == child:
                    builder.eq_obj1[e] = parent
                if builder.eq_obj2[e] == child:
                    builder.eq_obj2[e] = parent

        # delete joint j and body `child`
        _delete_joint(builder, j)
        _delete_body(builder, child)

    return {}


def _delete_joint(b: "ModelBuilder", j: int):
    qs, qe = b.joint_q_start[j], b.joint_q_start[j + 1]
    ds, de = b.joint_qd_start[j], b.joint_qd_start[j + 1]
    for lst in (b.joint_type, b.joint_parent, b.joint_child, b.joint_X_p,
                b.joint_X_c, b.joint_key, b.joint_world, b.joint_enabled,
                b.joint_articulation, b.joint_dof_dim):
        del lst[j]
    del b.joint_q[qs:qe]
    del b.joint_target_q[qs:qe]
    for lst in (b.joint_axis, b.joint_armature, b.joint_target_ke,
                b.joint_target_kd, b.joint_limit_lower, b.joint_limit_upper,
                b.joint_limit_ke, b.joint_limit_kd, b.joint_friction,
                b.joint_effort_limit, b.joint_velocity_limit, b.joint_qd,
                b.joint_dof_mode):
        del lst[ds:de]
    nq, nd = qe - qs, de - ds
    b.joint_q_start = (b.joint_q_start[:j + 1]
                       + [x - nq for x in b.joint_q_start[j + 2:]])
    b.joint_qd_start = (b.joint_qd_start[:j + 1]
                        + [x - nd for x in b.joint_qd_start[j + 2:]])
    # articulation starts referencing joints after j shift down
    b.articulation_start = [a - 1 if a > j else a
                            for a in b.articulation_start]
    # JOINT-typed equality constraints referencing later joints shift
    for e in range(len(b.eq_type)):
        if EqType(b.eq_type[e]) == EqType.JOINT:
            if b.eq_obj1[e] > j:
                b.eq_obj1[e] -= 1
            if b.eq_obj2[e] > j:
                b.eq_obj2[e] -= 1


def _delete_body(b: "ModelBuilder", body: int):
    for lst in (b.body_q, b.body_qd, b.body_com, b.body_mass,
                b.body_inertia, b.body_flags, b.body_world, b.body_key):
        del lst[body]

    def remap(x):
        return x - 1 if x > body else x

    b.shape_body = [remap(x) for x in b.shape_body]
    b.joint_parent = [remap(x) for x in b.joint_parent]
    b.joint_child = [remap(x) for x in b.joint_child]
    for e in range(len(b.eq_type)):
        if EqType(b.eq_type[e]) != EqType.JOINT:
            b.eq_obj1[e] = remap(b.eq_obj1[e])
            b.eq_obj2[e] = remap(b.eq_obj2[e])
    b._body_filter_pairs_ = {(remap(x), remap(y))
                             for (x, y) in b._body_filter_pairs
                             if x != body and y != body}
