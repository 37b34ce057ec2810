"""The finalized simulation model: a frozen pytree of device arrays.

TPU-native re-design of reference newton/_src/sim/model.py:299-2270. The
reference Model is a mutable container of Warp arrays on one GPU; ours is an
immutable flax pytree whose array leaves are ``jax.Array``s (shardable over a
``jax.sharding.Mesh``) plus a static :class:`ModelStructure` carrying
everything that determines *trace shapes* (counts, joint topology, geometry
sources, candidate contact pairs). Keeping structure out of the pytree leaves
means a jitted solver step retraces only when topology changes, never when
values change.

Layout (matches reference concepts/worlds):
- all entity arrays are flat concatenations across worlds;
- per-entity world index arrays (`body_world`, ...) identify the world;
- for homogeneous scenes (built via ``replicate``) ``structure.homogeneous``
  is True and per-world counts allow zero-copy ``(W, n)`` reshapes — the vmap
  fast path used by the batched solvers.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from .contacts import Contacts
from .control import Control
from .state import State

__all__ = ["Model", "ModelStructure", "AttributeFrequency", "AttributeSpec"]


class AttributeFrequency(enum.Enum):
    """Entity group an attribute is allocated per (reference: model.py:327-736)."""

    BODY = "body"
    SHAPE = "shape"
    JOINT = "joint"
    JOINT_DOF = "joint_dof"
    JOINT_COORD = "joint_coord"
    PARTICLE = "particle"
    WORLD = "world"
    ARTICULATION = "articulation"
    EQUALITY = "equality"
    ONCE = "once"


class AttributeAssignment(enum.Enum):
    """Which container a custom attribute lives on."""

    MODEL = "model"
    STATE = "state"
    CONTROL = "control"
    CONTACTS = "contacts"


@dataclass
class AttributeSpec:
    """Metadata for a custom (namespaced) attribute (reference: builder.py:807)."""

    name: str
    frequency: AttributeFrequency
    assignment: AttributeAssignment = AttributeAssignment.MODEL
    shape: Tuple[int, ...] = ()  # trailing shape per entity
    dtype: Any = np.float32
    default: Any = 0.0


class ModelStructure:
    """Static (non-traced) model topology and host-side geometry sources.

    Hash/eq are identity-based: a structure is created once at ``finalize()``
    and shared by all Models derived from it, so jit caches key on identity.
    """

    # counts
    world_count: int
    body_count: int
    shape_count: int
    joint_count: int
    joint_coord_count: int
    joint_dof_count: int
    articulation_count: int
    particle_count: int
    spring_count: int
    tri_count: int
    edge_count: int
    tet_count: int
    eq_count: int
    up_axis: int

    def __init__(self):
        # topology (numpy, host-side)
        self.joint_type = np.zeros(0, dtype=np.int32)
        self.joint_parent = np.zeros(0, dtype=np.int32)
        self.joint_child = np.zeros(0, dtype=np.int32)
        self.joint_q_start = np.zeros(1, dtype=np.int32)
        self.joint_qd_start = np.zeros(1, dtype=np.int32)
        self.joint_dof_dim = np.zeros((0, 2), dtype=np.int32)
        self.joint_dof_mode = np.zeros(0, dtype=np.int32)
        self.joint_world = np.zeros(0, dtype=np.int32)
        self.joint_parent_joint = np.zeros(0, dtype=np.int32)  # index of parent joint in chain, -1 root
        self.articulation_start = np.zeros(1, dtype=np.int32)
        self.articulation_world = np.zeros(0, dtype=np.int32)

        self.body_world = np.zeros(0, dtype=np.int32)
        self.shape_world = np.zeros(0, dtype=np.int32)
        self.particle_world = np.zeros(0, dtype=np.int32)
        self.eq_world = np.zeros(0, dtype=np.int32)

        self.shape_body = np.zeros(0, dtype=np.int32)
        self.shape_type = np.zeros(0, dtype=np.int32)
        self.shape_flags = np.zeros(0, dtype=np.int32)
        self.shape_collision_group = np.zeros(0, dtype=np.int32)
        self.shape_source_id = np.zeros(0, dtype=np.int32)  # into mesh/sdf/hf lists by type

        self.eq_type = np.zeros(0, dtype=np.int32)

        # keys / labels
        self.body_key: List[str] = []
        self.joint_key: List[str] = []
        self.shape_key: List[str] = []
        self.articulation_key: List[str] = []
        self.particle_key: List[str] = []

        # geometry sources (host objects)
        self.meshes: List[Any] = []
        self.sdfs: List[Any] = []
        self.heightfields: List[Any] = []
        # per-mesh offsets into pooled device arrays
        self.mesh_vertex_offsets = np.zeros(1, dtype=np.int32)
        self.mesh_index_offsets = np.zeros(1, dtype=np.int32)

        # collision candidate pairs (host-precomputed, reference builder.py:12413)
        self.candidate_pairs = np.zeros((0, 2), dtype=np.int32)
        self.candidate_pair_slots = np.zeros(1, dtype=np.int32)  # cumulative slot offsets
        self.rigid_contact_max = 0
        self.soft_contact_max = 0

        # homogeneous multi-world fast path
        self.homogeneous = False
        self.counts_per_world: Dict[str, int] = {}
        # number of global (world == -1) entities bracketing the flat arrays
        self.global_counts: Dict[str, int] = {}

        # custom attribute registry
        self.custom_specs: Dict[str, AttributeSpec] = {}

        # collision filtering
        self.shape_filter_pairs: set = set()

        # counts default
        self.world_count = 0
        self.body_count = 0
        self.shape_count = 0
        self.joint_count = 0
        self.joint_coord_count = 0
        self.joint_dof_count = 0
        self.articulation_count = 0
        self.particle_count = 0
        self.spring_count = 0
        self.tri_count = 0
        self.edge_count = 0
        self.tet_count = 0
        self.eq_count = 0
        self.up_axis = 2

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class Model(struct.PyTreeNode):
    """Finalized model. Array leaves are device arrays; ``structure`` is static.

    Array shapes use B=bodies, S=shapes, J=joints, D=joint dofs,
    Q=joint coords, N=particles, W=worlds (all flat across worlds).
    """

    # --- rigid bodies ---
    body_q: jnp.ndarray          # (B, 7) initial pose
    body_qd: jnp.ndarray         # (B, 6) initial twist [v_com, w], world frame
    body_com: jnp.ndarray        # (B, 3) COM in body frame
    body_mass: jnp.ndarray       # (B,)
    body_inv_mass: jnp.ndarray   # (B,)
    body_inertia: jnp.ndarray    # (B, 3, 3) about COM, body frame
    body_inv_inertia: jnp.ndarray  # (B, 3, 3)
    body_flags: jnp.ndarray      # (B,) int32

    # --- shapes ---
    shape_transform: jnp.ndarray  # (S, 7) body-local
    shape_body: jnp.ndarray       # (S,) int32, -1 = static/world
    shape_type: jnp.ndarray       # (S,) int32 GeoType
    shape_scale: jnp.ndarray      # (S, 3)
    shape_flags: jnp.ndarray      # (S,) int32
    shape_thickness: jnp.ndarray  # (S,)
    shape_collision_radius: jnp.ndarray  # (S,)
    shape_material_mu: jnp.ndarray  # (S,)
    shape_material_restitution: jnp.ndarray  # (S,)
    shape_material_ke: jnp.ndarray  # (S,)
    shape_material_kd: jnp.ndarray  # (S,)
    shape_material_kf: jnp.ndarray  # (S,)
    shape_material_kh: jnp.ndarray  # (S,) hydroelastic modulus (Pa/m)
    shape_world: jnp.ndarray      # (S,) int32
    shape_source: jnp.ndarray     # (S,) int32 index into pooled geometry, -1

    # --- joints ---
    joint_type_arr: jnp.ndarray   # (J,) int32
    joint_parent: jnp.ndarray     # (J,) int32 body index, -1 = world
    joint_child: jnp.ndarray      # (J,) int32 body index
    joint_X_p: jnp.ndarray        # (J, 7) parent anchor
    joint_X_c: jnp.ndarray        # (J, 7) child anchor
    joint_enabled: jnp.ndarray    # (J,) bool

    # dof-level
    joint_axis: jnp.ndarray       # (D, 3) axis in joint frame
    joint_armature: jnp.ndarray   # (D,)
    joint_target_ke: jnp.ndarray  # (D,)
    joint_target_kd: jnp.ndarray  # (D,)
    joint_limit_lower: jnp.ndarray  # (D,)
    joint_limit_upper: jnp.ndarray  # (D,)
    joint_limit_ke: jnp.ndarray   # (D,)
    joint_limit_kd: jnp.ndarray   # (D,)
    joint_friction: jnp.ndarray   # (D,)
    joint_effort_limit: jnp.ndarray  # (D,)
    joint_velocity_limit: jnp.ndarray  # (D,)
    joint_qd0: jnp.ndarray        # (D,) initial velocities

    # coord-level
    joint_q0: jnp.ndarray         # (Q,) initial coordinates
    joint_target_q0: jnp.ndarray  # (Q,) initial position targets

    # --- equality constraints (CONNECT/WELD/JOINT incl. mimic) ---
    eq_obj1: jnp.ndarray          # (E,) body or joint index per type
    eq_obj2: jnp.ndarray          # (E,)
    eq_anchor: jnp.ndarray        # (E, 3)
    eq_relpose: jnp.ndarray       # (E, 7)
    eq_polycoef: jnp.ndarray      # (E, 5)
    eq_enabled: jnp.ndarray       # (E,) bool
    eq_torquescale: jnp.ndarray   # (E,)

    # --- particles / cloth / soft ---
    particle_q: jnp.ndarray       # (N, 3)
    particle_qd: jnp.ndarray      # (N, 3)
    particle_mass: jnp.ndarray    # (N,)
    particle_inv_mass: jnp.ndarray  # (N,)
    particle_radius: jnp.ndarray  # (N,)
    particle_flags: jnp.ndarray   # (N,) int32

    spring_indices: jnp.ndarray   # (Sp, 2) int32
    spring_rest_length: jnp.ndarray  # (Sp,)
    spring_stiffness: jnp.ndarray  # (Sp,)
    spring_damping: jnp.ndarray   # (Sp,)

    tri_indices: jnp.ndarray      # (T, 3) int32
    tri_poses: jnp.ndarray        # (T, 2, 2) inverse rest matrix
    tri_materials: jnp.ndarray    # (T, 5) ke, ka, kd, drag, lift
    tri_areas: jnp.ndarray        # (T,)

    edge_indices: jnp.ndarray     # (E4, 4) int32 (o0, o1, v0, v1)
    edge_rest_angle: jnp.ndarray  # (E4,)
    edge_rest_length: jnp.ndarray  # (E4,)
    edge_bending_properties: jnp.ndarray  # (E4, 2) ke, kd

    tet_indices: jnp.ndarray      # (Tt, 4) int32
    tet_poses: jnp.ndarray        # (Tt, 3, 3) inverse rest matrix
    tet_materials: jnp.ndarray    # (Tt, 3) k_mu, k_lambda, k_damp

    # --- muscles (reference: builder.py:6303 add_muscle) ---
    tendon_params: jnp.ndarray   # (T, 3) ke, kd, rest_length
    sten_params: jnp.ndarray     # (Ts, 3) ke, kd, rest_length (spatial)
    muscle_params: jnp.ndarray  # (M, 7) f0 lm lt lmax pen passive_ke passive_kd    # (M, 5) f0, lm, lt, lmax, pen
    muscle_bodies: jnp.ndarray    # (Mw,) int32 waypoint body
    muscle_points: jnp.ndarray    # (Mw, 3) waypoint in body frame

    # --- pooled geometry ---
    mesh_points: jnp.ndarray      # (sumV, 3)
    mesh_indices: jnp.ndarray     # (sumI,) int32
    # fixed-budget contact sample points per shape (mesh/convex collision;
    # zeros elsewhere) and pooled dense SDF grids
    shape_sample_points: jnp.ndarray  # (S, K, 3) shape-frame, pre-scaled
    # hydroelastic pressure integration: VECTOR area sum(dA * n_outward)
    # of each sample's Voronoi cell of the shape surface, in the shape
    # frame. Projected onto the contact normal it yields the patch element
    # area (divergence theorem), so force = sum(p_i * max(-v_i . n, 0))
    # reproduces the reference's per-face integral
    # (sdf_hydroelastic.py:1521) without the marching-cubes surface.
    shape_sample_areas: jnp.ndarray   # (S, K, 3)
    sdf_grids: jnp.ndarray        # (n_sdf, R, R, R)
    sdf_lower: jnp.ndarray        # (n_sdf, 3)
    sdf_upper: jnp.ndarray        # (n_sdf, 3)
    # sparse quantized SDF textures (geometry/sdf_texture.py; shapes with
    # ShapeConfig.sdf_max_resolution >= 48 — reference sdf_texture.py:126).
    # block_index holds GLOBAL slots into the shared blocks pool.
    sdf_tex_block_index: jnp.ndarray  # (n_tex, B, B, B) int32, -1 = coarse
    sdf_tex_blocks: jnp.ndarray       # (total_blocks, 9, 9, 9) uint8
    sdf_tex_scale: jnp.ndarray        # (total_blocks,) f32
    sdf_tex_offset: jnp.ndarray       # (total_blocks,) f32
    sdf_tex_coarse: jnp.ndarray       # (n_tex, B+1, B+1, B+1) f32
    sdf_tex_lower: jnp.ndarray        # (n_tex, 3)
    sdf_tex_upper: jnp.ndarray        # (n_tex, 3)

    # --- global/scalar ---
    gravity: jnp.ndarray          # (W, 3)

    # global particle material scalars (reference Model.soft_contact_*)
    particle_ke: jnp.ndarray
    particle_kd: jnp.ndarray
    particle_kf: jnp.ndarray
    particle_mu: jnp.ndarray
    particle_cohesion: jnp.ndarray
    particle_adhesion: jnp.ndarray
    particle_max_velocity: jnp.ndarray
    soft_contact_ke: jnp.ndarray
    soft_contact_kd: jnp.ndarray
    soft_contact_kf: jnp.ndarray
    soft_contact_mu: jnp.ndarray
    soft_contact_margin: jnp.ndarray

    custom: Dict[str, Any] = struct.field(default_factory=dict)

    structure: ModelStructure = struct.field(pytree_node=False, default=None)

    # ------------------------------------------------------------------
    # convenience accessors (static counts come from structure)
    # ------------------------------------------------------------------
    @property
    def world_count(self) -> int:
        return self.structure.world_count

    @property
    def body_count(self) -> int:
        return self.structure.body_count

    @property
    def shape_count(self) -> int:
        return self.structure.shape_count

    @property
    def joint_count(self) -> int:
        return self.structure.joint_count

    @property
    def joint_coord_count(self) -> int:
        return self.structure.joint_coord_count

    @property
    def joint_dof_count(self) -> int:
        return self.structure.joint_dof_count

    @property
    def particle_count(self) -> int:
        return self.structure.particle_count

    @property
    def articulation_count(self) -> int:
        return self.structure.articulation_count

    @property
    def up_axis(self) -> int:
        return self.structure.up_axis

    @property
    def joint_q_start(self) -> np.ndarray:
        return self.structure.joint_q_start

    @property
    def joint_qd_start(self) -> np.ndarray:
        return self.structure.joint_qd_start

    @property
    def joint_type(self) -> np.ndarray:
        return self.structure.joint_type

    @property
    def articulation_start(self) -> np.ndarray:
        return self.structure.articulation_start

    @property
    def device(self):
        devs = self.body_q.devices() if self.body_count else self.gravity.devices()
        return next(iter(devs))

    # ------------------------------------------------------------------
    # factories (reference: model.py:1758, :1842, :1951)
    # ------------------------------------------------------------------
    def state(self) -> State:
        """Create a State initialized from the model's defaults."""
        custom = {
            name: self._alloc_custom(spec)
            for name, spec in self.structure.custom_specs.items()
            if spec.assignment == AttributeAssignment.STATE
        }
        # custom arrays whose values were provided at build time live on the
        # model's custom dict; copy initial values where present
        for name in list(custom.keys()):
            if name in self.custom:
                custom[name] = self.custom[name]
        return State(
            body_q=self.body_q,
            body_qd=self.body_qd,
            body_f=jnp.zeros_like(self.body_qd),
            joint_q=self.joint_q0,
            joint_qd=self.joint_qd0,
            particle_q=self.particle_q,
            particle_qd=self.particle_qd,
            particle_f=jnp.zeros_like(self.particle_q),
            custom=custom,
        )

    def control(self) -> Control:
        custom = {
            name: self._alloc_custom(spec)
            for name, spec in self.structure.custom_specs.items()
            if spec.assignment == AttributeAssignment.CONTROL
        }
        for name in list(custom.keys()):
            if name in self.custom:
                custom[name] = self.custom[name]
        return Control(
            joint_target_q=self.joint_target_q0,
            joint_target_qd=jnp.zeros_like(self.joint_qd0),
            joint_f=jnp.zeros_like(self.joint_qd0),
            tendon_f=jnp.zeros((self.tendon_params.shape[0],),
                               dtype=self.joint_q0.dtype),
            muscle_activations=jnp.zeros((self.muscle_params.shape[0],),
                                         dtype=self.joint_q0.dtype),
            custom=custom,
        )

    def contacts(self, rigid_contact_max: Optional[int] = None,
                 soft_contact_max: Optional[int] = None) -> Contacts:
        C = rigid_contact_max if rigid_contact_max is not None else self.structure.rigid_contact_max
        P = soft_contact_max if soft_contact_max is not None else self.structure.soft_contact_max
        return Contacts.zeros(C, P, dtype=self.body_q.dtype)

    def _alloc_custom(self, spec: AttributeSpec):
        n = self._frequency_count(spec.frequency)
        shape = (n, *spec.shape) if spec.frequency != AttributeFrequency.ONCE else spec.shape
        return jnp.full(shape, spec.default, dtype=spec.dtype)

    def _frequency_count(self, freq: AttributeFrequency) -> int:
        s = self.structure
        return {
            AttributeFrequency.BODY: s.body_count,
            AttributeFrequency.SHAPE: s.shape_count,
            AttributeFrequency.JOINT: s.joint_count,
            AttributeFrequency.JOINT_DOF: s.joint_dof_count,
            AttributeFrequency.JOINT_COORD: s.joint_coord_count,
            AttributeFrequency.PARTICLE: s.particle_count,
            AttributeFrequency.WORLD: s.world_count,
            AttributeFrequency.ARTICULATION: s.articulation_count,
            AttributeFrequency.EQUALITY: s.eq_count,
            AttributeFrequency.ONCE: 1,
        }[freq]

    # ------------------------------------------------------------------
    # mutation helpers (functional)
    # ------------------------------------------------------------------
    def set_gravity(self, gravity) -> "Model":
        """Return a model with updated per-world gravity (reference: model.py:1887)."""
        g = jnp.asarray(gravity, dtype=self.gravity.dtype)
        if g.ndim == 1:
            g = jnp.broadcast_to(g, self.gravity.shape)
        return self.replace(gravity=g)
