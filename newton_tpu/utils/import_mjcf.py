"""MJCF (MuJoCo XML) importer.

TPU-native re-design of reference newton/_src/utils/import_mjcf.py (3.4K LoC;
public entry ModelBuilder.add_mjcf, builder.py:3615). Parses the MuJoCo
subset robotics models actually use: compiler settings, default classes with
inheritance, nested bodies, hinge/slide/ball/free joints (multiple joints per
body composed into one Newton joint, reference import_mjcf.py:2069),
geoms (plane/sphere/capsule/box/cylinder/ellipsoid/mesh), sites, inertial
overrides, actuators (motor/position/velocity), contact pair/exclude and
equality constraints. Visual-only assets (textures, materials, lights,
cameras) are skipped.

Actuator mapping: MuJoCo ``ctrl`` drives are translated to the builder's
per-dof target gains — ``motor`` sets a gear scale consumed by
``control.joint_f``; ``position``/``velocity`` set target_ke/target_kd —
plus ``mjc:*`` custom attributes so solvers can reconstruct the exact
MuJoCo actuation model.
"""

from __future__ import annotations

import math
import os
import re
import xml.etree.ElementTree as ET
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..core.host_math import (
    np_quat_between_axes,
    np_quat_from_axis_angle,
    np_quat_identity,
    np_quat_mul,
    np_quat_rotate,
    np_quat_rotate_inv,
    np_transform,
    np_transform_identity,
    np_transform_multiply,
)
from ..core.types import MAXVAL
from ..geometry.types import GeoType, Mesh
from ..sim.enums import EqType, JointType
from ..sim.model import AttributeAssignment, AttributeFrequency

__all__ = ["parse_mjcf"]


def _parse_vec(s: Optional[str], default=None, n=None):
    if s is None:
        return None if default is None else np.asarray(default, dtype=np.float64)
    v = np.fromstring(s, sep=" ", dtype=np.float64)
    if n is not None and len(v) < n:
        v = np.concatenate([v, np.zeros(n - len(v))])
    return v


def _parse_float(s, default):
    return float(s) if s is not None else default


def _parse_bool(s, default):
    if s is None:
        return default
    return s.lower() in ("true", "1")


class _Defaults:
    """MuJoCo default-class tree: per-element-type attribute dicts."""

    def __init__(self, parent: Optional["_Defaults"] = None):
        self.parent = parent
        self.attrs: Dict[str, Dict[str, str]] = {}
        self.children: Dict[str, "_Defaults"] = {}

    def resolve(self, element_type: str) -> Dict[str, str]:
        base = self.parent.resolve(element_type) if self.parent else {}
        out = dict(base)
        out.update(self.attrs.get(element_type, {}))
        return out

    def find(self, class_name: Optional[str]) -> "_Defaults":
        if class_name is None:
            return self
        if class_name in self.children:
            return self.children[class_name]
        for c in self.children.values():
            r = c.find(class_name)
            if r is not c and class_name in c.children or r.parent is not None:
                found = c.find(class_name)
                if found is not c or class_name in c.children:
                    return found
        # flat lookup
        def walk(node):
            if class_name in node.children:
                return node.children[class_name]
            for ch in node.children.values():
                r = walk(ch)
                if r is not None:
                    return r
            return None
        return walk(self) or self


def _load_defaults(elem: ET.Element, parent: Optional[_Defaults] = None) -> _Defaults:
    d = _Defaults(parent)
    for child in elem:
        if child.tag == "default":
            name = child.get("class")
            sub = _load_defaults(child, d)
            if name:
                d.children[name] = sub
        else:
            d.attrs[child.tag] = dict(child.attrib)
    return d


def _expand_includes(elem: ET.Element, base_dir: str, depth: int = 0) -> None:
    """Inline MJCF ``<include file=.../>`` elements (MuJoCo semantics: the
    included file's root children replace the include element in place).
    Reference models such as gymnasium-robotics' adroit hand and franka
    kitchen are split across include files."""
    if depth > 8:
        return
    i = 0
    while i < len(elem):
        child = elem[i]
        if child.tag == "include":
            path = os.path.join(base_dir, child.get("file", ""))
            try:
                sub = ET.parse(path).getroot()
            except (OSError, ET.ParseError) as e:
                # importing a silently truncated model is worse than a loud
                # warning (ADVICE r3) — keep going (MuJoCo would hard-fail)
                # but tell the user what was dropped
                import warnings
                warnings.warn(
                    f"MJCF <include file={child.get('file')!r}> could not "
                    f"be loaded ({e}); the included subtree is missing "
                    "from the imported model")
                del elem[i]
                continue
            _expand_includes(sub, os.path.dirname(os.path.abspath(path)),
                             depth + 1)
            del elem[i]
            for j, grand in enumerate(list(sub)):
                elem.insert(i + j, grand)
            i += len(sub)
        else:
            _expand_includes(child, base_dir, depth)
            i += 1


def _merge_repeated_sections(root: ET.Element) -> None:
    """MuJoCo allows repeated top-level sections (``<asset>`` twice, etc.);
    this parser uses ``root.find`` which sees only the first. Fold every
    repeat's children into the first occurrence."""
    for tag in ("asset", "default", "worldbody", "actuator", "tendon",
                "equality", "contact", "sensor", "keyframe"):
        secs = root.findall(tag)
        if len(secs) > 1:
            first = secs[0]
            for extra in secs[1:]:
                for child in list(extra):
                    first.append(child)
                root.remove(extra)


def parse_mjcf(builder, source: str, xform=None, floating: Optional[bool] = None,
               armature_scale: float = 1.0, scale: float = 1.0,
               ignore_names: Tuple[str, ...] = (),
               collapse_fixed_joints: bool = False,
               enable_self_collisions: bool = False,
               up_axis: str = "Z",
               key_prefix: Optional[str] = None,
               actuation: str = "mjc"):
    """Parse an MJCF file or XML string into ``builder``
    (reference: ModelBuilder.add_mjcf, builder.py:3615 -> import_mjcf.py).

    Returns a dict with name->index maps for bodies/joints/shapes/actuators.
    """
    if os.path.exists(source):
        tree = ET.parse(source)
        root = tree.getroot()
        base_dir = os.path.dirname(os.path.abspath(source))
    else:
        root = ET.fromstring(source)
        base_dir = "."
    _expand_includes(root, base_dir)
    _merge_repeated_sections(root)

    # --- compiler settings ---
    compiler = root.find("compiler")
    angle_deg = True
    inertia_from_geom = True
    mesh_dir = ""
    if compiler is not None:
        angle_deg = compiler.get("angle", "degree") == "degree"
        ifg = compiler.get("inertiafromgeom", "auto")
        inertia_from_geom = ifg in ("true", "auto")
        mesh_dir = compiler.get("meshdir", compiler.get("assetdir", ""))
    autolimits = compiler.get("autolimits", "true") == "true" if compiler is not None else True

    def to_rad(x):
        return math.radians(x) if angle_deg else x

    # --- options ---
    option = root.find("option")
    if option is not None:
        g = _parse_vec(option.get("gravity"))
        if g is not None:
            builder.gravity = float(np.linalg.norm(g)) * (-1.0 if g[2] <= 0 else 1.0)
        # integrator/timestep flow to the solver via Model.structure
        # (reference import path: solver_mujoco.py:613-614 honors
        # <option integrator="euler|rk4|implicit|implicitfast">)
        opts = getattr(builder, "mjc_options", None)
        if opts is None:
            opts = builder.mjc_options = {}
        integ = option.get("integrator")
        if integ is not None:
            opts["integrator"] = integ.strip().lower()
        ts = option.get("timestep")
        if ts is not None:
            opts["timestep"] = float(ts)

    # --- defaults ---
    defaults_elem = root.find("default")
    defaults = _load_defaults(defaults_elem) if defaults_elem is not None else _Defaults()

    # --- assets (meshes) ---
    meshes: Dict[str, Mesh] = {}
    asset = root.find("asset")
    if asset is not None:
        for m in asset.findall("mesh"):
            name = m.get("name") or os.path.splitext(os.path.basename(m.get("file", "")))[0]
            fname = m.get("file")
            mscale = _parse_vec(m.get("scale"), default=[1, 1, 1], n=3)
            if fname:
                path = os.path.join(base_dir, mesh_dir, fname)
                mesh = _load_mesh_file(path)
                if mesh is not None:
                    mesh.vertices = mesh.vertices * mscale * scale
                    meshes[name] = mesh

    pre = (key_prefix + "/") if key_prefix else ""
    base_xform = np.asarray(xform, dtype=np.float64) if xform is not None \
        else np_transform_identity()

    name_to_body: Dict[str, int] = {"world": -1, "": -1}
    name_to_joint: Dict[str, int] = {}
    name_to_site: Dict[str, int] = {}
    name_to_shape: Dict[str, int] = {}
    joint_dof_start: Dict[str, int] = {}
    joint_coord_start: Dict[str, int] = {}
    body_shapes: Dict[int, List[int]] = {}
    coord_refs: Dict[int, float] = {}   # coord index -> MJCF joint ref

    def local_xform(attrib, cls_attrs=None) -> np.ndarray:
        pos = _parse_vec(attrib.get("pos"), default=[0, 0, 0], n=3) * scale
        if "quat" in attrib:
            q_wxyz = _parse_vec(attrib["quat"], n=4)
            q = np.array([q_wxyz[1], q_wxyz[2], q_wxyz[3], q_wxyz[0]])
            n = np.linalg.norm(q)
            q = q / n if n > 0 else np_quat_identity()
        elif "euler" in attrib:
            e = _parse_vec(attrib["euler"], n=3)
            q = np_quat_identity()
            for ax, ang in zip(np.eye(3), e):
                q = np_quat_mul(q, np_quat_from_axis_angle(ax, to_rad(ang)))
        elif "axisangle" in attrib:
            aa = _parse_vec(attrib["axisangle"], n=4)
            q = np_quat_from_axis_angle(aa[:3], to_rad(aa[3]))
        elif "zaxis" in attrib:
            z = _parse_vec(attrib["zaxis"], n=3)
            q = np_quat_between_axes([0, 0, 1], z / np.linalg.norm(z))
        elif "xyaxes" in attrib:
            v = _parse_vec(attrib["xyaxes"], n=6)
            xa, ya = v[:3], v[3:]
            xa /= np.linalg.norm(xa)
            ya = ya - xa * (xa @ ya)
            ya /= np.linalg.norm(ya)
            za = np.cross(xa, ya)
            from ..core.host_math import np_quat_from_matrix
            q = np_quat_from_matrix(np.stack([xa, ya, za], axis=1))
        else:
            q = np_quat_identity()
        return np_transform(pos, q)

    def resolve_attrs(elem, etype, body_class) -> Dict[str, str]:
        cls = elem.get("class") or body_class
        d = defaults.find(cls) if cls else defaults
        out = d.resolve(etype)
        out.update(elem.attrib)
        return out

    # ---------------- geoms ----------------
    def add_geom(geom: ET.Element, body_idx: int, body_class: Optional[str]):
        a = resolve_attrs(geom, "geom", body_class)
        gtype = a.get("type", "sphere")
        name = a.get("name")
        if name and any(re.match(p, name) for p in ignore_names):
            return
        # collision filtering: contype=0 & conaffinity=0 -> visual only
        contype = int(_parse_float(a.get("contype"), 1))
        conaffinity = int(_parse_float(a.get("conaffinity"), 1))
        collides = (contype != 0) or (conaffinity != 0)
        cfg = builder.default_shape_cfg.copy()
        cfg.density = _parse_float(a.get("density"), 1000.0)
        fr = _parse_vec(a.get("friction"), default=[1.0, 0.005, 0.0001], n=3)
        cfg.mu = float(fr[0])
        cfg.has_shape_collision = collides
        cfg.has_particle_collision = collides
        cfg.collision_group = 1 if collides else 0
        cfg.contype = contype
        cfg.conaffinity = conaffinity
        size = _parse_vec(a.get("size"), default=[0.01, 0, 0], n=3) * scale

        xf = local_xform(a)
        half_h = None
        if "fromto" in a:
            ft = _parse_vec(a["fromto"], n=6) * scale
            p0, p1 = ft[:3], ft[3:]
            mid = 0.5 * (p0 + p1)
            d = p1 - p0
            length = np.linalg.norm(d)
            q = np_quat_between_axes([0, 0, 1], d / max(length, 1e-12))
            xf = np_transform(mid, q)
            half_h = 0.5 * length

        key = pre + name if name else None
        # MuJoCo geom ``mass`` overrides density: convert to an equivalent
        # density so the builder's inertia accumulation stays one code path
        # (MuJoCo does the same internally: density = mass / volume)
        mass_attr = a.get("mass")
        if mass_attr is not None:
            m_val = float(mass_attr)
            hh = half_h if half_h is not None else float(size[1])
            r = float(size[0])
            if gtype == "sphere":
                vol = 4.0 / 3.0 * math.pi * r ** 3
            elif gtype == "capsule":
                vol = math.pi * r * r * (2.0 * hh) \
                    + 4.0 / 3.0 * math.pi * r ** 3
            elif gtype == "cylinder":
                vol = math.pi * r * r * (2.0 * hh)
            elif gtype == "box":
                vol = 8.0 * float(size[0]) * float(size[1]) * float(size[2])
            elif gtype == "ellipsoid":
                vol = (4.0 / 3.0 * math.pi * float(size[0])
                       * float(size[1]) * float(size[2]))
            elif gtype == "mesh" and meshes.get(a.get("mesh", "")) is not None:
                from ..geometry.inertia import compute_mesh_inertia
                msh = meshes[a.get("mesh", "")]
                vol = float(compute_mesh_inertia(
                    1.0, msh.vertices, msh.indices)[0])
            else:
                vol = 0.0
            if vol > 1e-12 and m_val > 0.0:
                cfg.density = m_val / vol
        if gtype == "plane":
            s = builder.add_shape_plane(body_idx, xform=xf, cfg=cfg, key=key)
        elif gtype == "sphere":
            s = builder.add_shape_sphere(body_idx, xform=xf, radius=float(size[0]), cfg=cfg, key=key)
        elif gtype == "capsule":
            hh = half_h if half_h is not None else float(size[1])
            s = builder.add_shape_capsule(body_idx, xform=xf, radius=float(size[0]),
                                          half_height=hh, axis="Z", cfg=cfg, key=key)
        elif gtype == "cylinder":
            hh = half_h if half_h is not None else float(size[1])
            s = builder.add_shape_cylinder(body_idx, xform=xf, radius=float(size[0]),
                                           half_height=hh, axis="Z", cfg=cfg, key=key)
        elif gtype == "box":
            s = builder.add_shape_box(body_idx, xform=xf, hx=float(size[0]),
                                      hy=float(size[1]), hz=float(size[2]), cfg=cfg, key=key)
        elif gtype == "ellipsoid":
            s = builder.add_shape_ellipsoid(body_idx, xform=xf, rx=float(size[0]),
                                            ry=float(size[1]), rz=float(size[2]), cfg=cfg, key=key)
        elif gtype == "mesh":
            mesh = meshes.get(a.get("mesh", ""))
            if mesh is not None:
                s = builder.add_shape_mesh(body_idx, xform=xf, mesh=mesh, cfg=cfg, key=key)
            else:
                return
        else:
            return
        if name:
            name_to_shape[name] = s
        body_shapes.setdefault(body_idx, []).append(s)

    # ---------------- joints ----------------
    def parse_joint_elem(j: ET.Element, body_class):
        a = resolve_attrs(j, "joint", body_class)
        jtype = a.get("type", "hinge")
        name = a.get("name")
        pos = _parse_vec(a.get("pos"), default=[0, 0, 0], n=3) * scale
        axis = _parse_vec(a.get("axis"), default=[0, 0, 1], n=3)
        nrm = np.linalg.norm(axis)
        axis = axis / nrm if nrm > 0 else np.array([0.0, 0, 1])
        limited = _parse_bool(a.get("limited"), None)
        rng = _parse_vec(a.get("range"), default=[0, 0], n=2)
        has_range = (rng[0] != 0.0 or rng[1] != 0.0)
        if limited is None:
            limited = autolimits and has_range
        damping = _parse_float(a.get("damping"), 0.0)
        armature = _parse_float(a.get("armature"), 0.0) * armature_scale
        stiffness = _parse_float(a.get("stiffness"), 0.0)
        # MuJoCo ``ref``: the qpos value at the built pose. Newton joint
        # coordinates are displacements from the built pose, so internal
        # quantities shift by ref (limits here; qpos round-trips through
        # the mjc:qpos_ref custom attribute).
        ref = _parse_float(a.get("ref"), 0.0)
        return dict(type=jtype, name=name, pos=pos, axis=axis, limited=limited,
                    range=rng, damping=damping, armature=armature,
                    stiffness=stiffness, ref=ref)

    from ..sim.builder import JointDofConfig

    def conv_ref(j):
        """Joint ``ref`` in Newton units (radians / scaled meters)."""
        return (j["ref"] * scale if j["type"] == "slide"
                else to_rad(j["ref"]))

    def dof_cfg(j, is_linear):
        lo, hi = j["range"]
        if not is_linear:
            lo, hi = to_rad(lo), to_rad(hi)
        else:
            lo, hi = lo * scale, hi * scale
        # shift MJCF qpos-space limits into displacement space
        r = conv_ref(j)
        lo, hi = lo - r, hi - r
        cfg = JointDofConfig(
            axis=j["axis"],
            limit_lower=lo if j["limited"] else -MAXVAL,
            limit_upper=hi if j["limited"] else MAXVAL,
            armature=j["armature"],
            target_kd=j["damping"],     # joint damping -> velocity drive to 0
            target_ke=j["stiffness"],
        )
        return cfg

    # ---------------- body recursion ----------------
    def parse_body(elem: ET.Element, parent_idx: int, X_parent_world: np.ndarray,
                   body_class: Optional[str], depth: int):
        a = dict(elem.attrib)
        childclass = elem.get("childclass") or body_class
        name = a.get("name", f"body_{builder.body_count}")
        X_rel = local_xform(a)
        X_world = np_transform_multiply(X_parent_world, X_rel)

        joints = [parse_joint_elem(j, childclass) for j in elem.findall("joint")]
        if elem.find("freejoint") is not None:
            joints = [dict(type="free", name=elem.find("freejoint").get("name"),
                           pos=np.zeros(3), axis=np.array([0., 0, 1]),
                           limited=False, range=(0, 0), damping=0.0,
                           armature=0.0, stiffness=0.0)]

        # inertial override
        inertial = elem.find("inertial")
        com = None
        mass = 0.0
        I_m = None
        if inertial is not None:
            com = _parse_vec(inertial.get("pos"), default=[0, 0, 0], n=3) * scale
            mass = _parse_float(inertial.get("mass"), 0.0)
            diag = _parse_vec(inertial.get("diaginertia"))
            if diag is not None:
                I_m = np.diag(diag)
            full = _parse_vec(inertial.get("fullinertia"))
            if full is not None:
                I_m = np.array([[full[0], full[3], full[4]],
                                [full[3], full[1], full[5]],
                                [full[4], full[5], full[2]]])

        use_inertial = inertial is not None and not inertia_from_geom
        body_idx = builder.add_body(
            xform=X_world,
            mass=mass if use_inertial else 0.0,
            com=com if use_inertial else None,
            I_m=I_m if use_inertial else None,
            key=pre + name,
        )
        name_to_body[name] = body_idx

        # root body handling: explicit floating override
        is_root = depth == 0
        if is_root and floating is True and not any(j["type"] == "free" for j in joints):
            joints = [dict(type="free", name=None, pos=np.zeros(3),
                           axis=np.array([0., 0, 1]), limited=False, range=(0, 0),
                           damping=0.0, armature=0.0, stiffness=0.0)]
        if is_root and floating is False:
            joints = [j for j in joints if j["type"] != "free"]

        # compose MJCF joints into one Newton joint (reference :2069)
        jq_start = builder.joint_coord_count
        jd_start = builder.joint_dof_count
        if not joints:
            jidx = builder.add_joint_fixed(parent_idx, body_idx,
                                           xform_p=X_rel if parent_idx < 0 or True else X_rel,
                                           key=pre + name + "_fixed")
        elif len(joints) == 1 and joints[0]["type"] == "free":
            jidx = builder.add_joint_free(body_idx, parent=parent_idx,
                                          xform_p=None, xform_c=None,
                                          key=(pre + joints[0]["name"]) if joints[0]["name"] else None)
        elif len(joints) == 1 and joints[0]["type"] == "ball":
            j = joints[0]
            anchor = np_transform(j["pos"])
            jidx = builder.add_joint_ball(parent_idx, body_idx,
                                          xform_p=np_transform_multiply(X_rel, anchor),
                                          xform_c=anchor,
                                          armature=j["armature"],
                                          key=(pre + j["name"]) if j["name"] else None)
        else:
            lin = [dof_cfg(j, True) for j in joints if j["type"] == "slide"]
            ang = [dof_cfg(j, False) for j in joints if j["type"] == "hinge"]
            anchor = np_transform(joints[0]["pos"])
            kwargs = dict(
                xform_p=np_transform_multiply(X_rel, anchor),
                xform_c=anchor,
                key=(pre + joints[0]["name"]) if joints[0]["name"] else None,
            )
            if len(lin) == 1 and not ang:
                jt = JointType.PRISMATIC
                jidx = builder.add_joint(jt, parent_idx, body_idx,
                                         linear_axes=lin, **kwargs)
            elif len(ang) == 1 and not lin:
                jt = JointType.REVOLUTE
                jidx = builder.add_joint(jt, parent_idx, body_idx,
                                         angular_axes=ang, **kwargs)
            else:
                jidx = builder.add_joint(JointType.D6, parent_idx, body_idx,
                                         linear_axes=lin, angular_axes=ang,
                                         **kwargs)
        # record per-MJCF-joint dof/coord offsets for actuators
        off_d, off_q = jd_start, jq_start
        for j in joints:
            if j["name"]:
                name_to_joint[j["name"]] = jidx
                joint_dof_start[j["name"]] = off_d
                joint_coord_start[j["name"]] = off_q
            if j["type"] in ("hinge", "slide") and j["ref"]:
                coord_refs[off_q] = conv_ref(j)
            nd = {"hinge": 1, "slide": 1, "ball": 3, "free": 6}[j["type"]]
            nq = {"hinge": 1, "slide": 1, "ball": 4, "free": 7}[j["type"]]
            off_d += nd
            off_q += nq
        # free-joint world pose initial coords already set by add_joint
        for g in elem.findall("geom"):
            add_geom(g, body_idx, childclass)
        for s in elem.findall("site"):
            sa = resolve_attrs(s, "site", childclass)
            sidx = builder.add_site(body_idx, xform=local_xform(sa),
                                    key=pre + sa.get("name", f"site_{builder.shape_count}"))
            if sa.get("name"):
                name_to_site[sa["name"]] = sidx
        for child in elem.findall("body"):
            parse_body(child, body_idx, X_world, childclass, depth + 1)

    worldbody = root.find("worldbody")
    if worldbody is None:
        raise ValueError("MJCF has no <worldbody>")
    builder.add_articulation(key=pre + (root.get("model") or "mjcf"))
    for g in worldbody.findall("geom"):
        add_geom(g, -1, None)
    for s in worldbody.findall("site"):
        sa = resolve_attrs(s, "site", None)
        sidx = builder.add_site(-1, xform=local_xform(sa),
                                key=pre + sa.get("name", "site"))
        if sa.get("name"):
            name_to_site[sa["name"]] = sidx
    for body in worldbody.findall("body"):
        parse_body(body, -1, base_xform, None, 0)

    # MJCF joint ``ref`` offsets: MuJoCo qpos = Newton displacement + ref
    # (gymnasium hopper/walker2d root height rides on ref="1.25")
    if coord_refs:
        builder.add_custom_attribute("mjc:qpos_ref",
                                     AttributeFrequency.JOINT_COORD,
                                     default=0.0)
        builder.add_custom_values("mjc:qpos_ref", coord_refs)

    # ---------------- tendons (fixed) ----------------
    name_to_tendon: Dict[str, int] = {}
    name_to_sten: Dict[str, int] = {}
    tendon_root = root.find("tendon")
    if tendon_root is not None:
        for fx in tendon_root.findall("fixed"):
            a = resolve_attrs(fx, "tendon", None)
            js, cs = [], []
            for jel in fx.findall("joint"):
                jn = jel.get("joint", "")
                if jn in name_to_joint:
                    js.append(name_to_joint[jn])
                    cs.append(float(jel.get("coef", "1")))
            if not js:
                continue
            tid = builder.add_tendon_fixed(
                js, cs,
                stiffness=_parse_float(a.get("stiffness"), 0.0),
                damping=_parse_float(a.get("damping"), 0.0),
                key=fx.get("name"))
            if fx.get("name"):
                name_to_tendon[fx.get("name")] = tid
        # spatial tendons: site-routed paths with sphere/cylinder wrap geoms
        # and sidesites, evaluated exactly inside the jitted step
        # (sim/tendon.py; reference wrap arrays import_mjcf.py:2865-2868)
        def _site_world(sidx):
            sb = int(builder.shape_body[sidx])
            sp_ = np.asarray(builder.shape_transform[sidx][:3])
            if sb < 0:
                return sp_
            bx = np.asarray(builder.body_q[sb])
            return bx[:3] + np_quat_rotate(bx[3:7], sp_)

        for sp in tendon_root.findall("spatial"):
            sa = resolve_attrs(sp, "tendon", None)
            elems: List[tuple] = []
            ok = True
            for ch in sp:
                if ch.tag == "site":
                    sname = ch.get("site", "")
                    if sname not in name_to_site:
                        ok = False
                        break
                    sidx = name_to_site[sname]
                    elems.append(("site", int(builder.shape_body[sidx]),
                                  tuple(np.asarray(
                                      builder.shape_transform[sidx][:3]))))
                elif ch.tag == "geom":
                    gname = ch.get("geom", "")
                    if gname not in name_to_shape:
                        ok = False
                        break
                    gidx = name_to_shape[gname]
                    gb = int(builder.shape_body[gidx])
                    gx = np.asarray(builder.shape_transform[gidx])
                    gt = int(builder.shape_type[gidx])
                    side = None
                    ssname = ch.get("sidesite")
                    if ssname and ssname in name_to_site:
                        ssidx = name_to_site[ssname]
                        # sidesite expressed in the wrap body's frame (exact
                        # when it sits on the wrap body — the common case;
                        # otherwise a build-pose approximation)
                        sw = _site_world(ssidx)
                        if gb >= 0:
                            bx = np.asarray(builder.body_q[gb])
                            side = tuple(np_quat_rotate_inv(
                                bx[3:7], sw - bx[:3]))
                        else:
                            side = tuple(sw)
                    r = float(builder.shape_scale[gidx][0])
                    if gt == int(GeoType.SPHERE):
                        elems.append(("sphere", gb, tuple(gx[:3]), r, side))
                    elif gt == int(GeoType.CYLINDER):
                        ax = np_quat_rotate(gx[3:7], np.array([0.0, 0.0, 1.0]))
                        elems.append(("cylinder", gb, tuple(gx[:3]),
                                      tuple(ax), r, side))
                    else:
                        ok = False
                        break
                elif ch.tag == "pulley":
                    import warnings
                    warnings.warn(f"spatial tendon {sp.get('name')}: pulley "
                                  "elements are not supported; skipping "
                                  "tendon")
                    ok = False
                    break
            n_sites = sum(1 for e in elems if e[0] == "site")
            if not ok or n_sites < 2:
                continue
            # springlength accepts one OR two values (deadband form); we
            # take the lower bound as the rest length (MuJoCo XML ref)
            slen_v = _parse_vec(sa.get("springlength"), [-1.0])
            slen = float(slen_v[0])
            tid = builder.add_tendon_spatial(
                elems,
                stiffness=_parse_float(sa.get("stiffness"), 0.0),
                damping=_parse_float(sa.get("damping"), 0.0),
                rest_length=None if slen < 0 else slen,
                key=sp.get("name"))
            if sp.get("name"):
                name_to_sten[sp.get("name")] = tid

    # ---------------- actuators ----------------
    # Full MuJoCo actuator semantics (reference solver_mujoco.py:500-529
    # CtrlSource/CtrlType): every shortcut is lowered to the canonical
    # gain/bias/dyntype form and stored in structured MJCActuation tables
    # consumed inside the solver step; the mjc:ctrl control vector and
    # mjc:act activation state are registered as custom attributes.
    # actuation="pd" restores the legacy lossy mapping (position/velocity
    # actuators -> joint_target_ke/kd PD drives).
    actuators = []
    act_root = root.find("actuator")
    if act_root is not None:
        builder.add_custom_attribute("mjc:actuator_gear", AttributeFrequency.JOINT_DOF,
                                     default=0.0)
        builder.add_custom_attribute("mjc:actuator_ctrlrange_lo", AttributeFrequency.JOINT_DOF,
                                     default=-MAXVAL)
        builder.add_custom_attribute("mjc:actuator_ctrlrange_hi", AttributeFrequency.JOINT_DOF,
                                     default=MAXVAL)
        from ..solvers.generalized.actuation import (
            BIAS_AFFINE, BIAS_MUSCLE, BIAS_NONE, DYN_FILTER, DYN_FILTEREXACT,
            DYN_INTEGRATOR, DYN_MUSCLE, DYN_NONE, GAIN_AFFINE, GAIN_FIXED,
            GAIN_MUSCLE, MJCActuation)
        _DYN = {"none": DYN_NONE, "integrator": DYN_INTEGRATOR,
                "filter": DYN_FILTER, "filterexact": DYN_FILTEREXACT,
                "muscle": DYN_MUSCLE}
        _GAIN = {"fixed": GAIN_FIXED, "affine": GAIN_AFFINE,
                 "muscle": GAIN_MUSCLE}
        _BIAS = {"none": BIAS_NONE, "affine": BIAS_AFFINE,
                 "muscle": BIAS_MUSCLE}
        recs = []
        for act in act_root:
            a = resolve_attrs(act, act.tag, None)
            tname = a.get("tendon")
            jname = a.get("joint")
            if tname is not None and tname in name_to_tendon:
                trn = ("tendon", name_to_tendon[tname])
            elif tname is not None and tname in name_to_sten:
                trn = ("sten", name_to_sten[tname])
            elif jname is not None and jname in joint_dof_start:
                trn = ("joint", joint_dof_start[jname],
                       joint_coord_start[jname])
            else:
                continue
            gear = float(a["gear"].split()[0]) if a.get("gear") else 1.0
            cr = _parse_vec(a.get("ctrlrange"), n=2)
            fr = _parse_vec(a.get("forcerange"), n=2)
            ar = _parse_vec(a.get("actrange"), n=2)
            r = dict(name=a.get("name", tname or jname), trn=trn, gear=gear,
                     type=act.tag,
                     ctrlrange=cr, forcerange=fr, actrange=ar,
                     dyntype=DYN_NONE, dynprm=[1.0, 0.0, 0.0],
                     gaintype=GAIN_FIXED, gainprm=[1.0] + [0.0] * 8,
                     biastype=BIAS_NONE, biasprm=[0.0] * 9)
            tag = act.tag
            if tag == "motor":
                pass
            elif tag == "general":
                r["dyntype"] = _DYN.get(a.get("dyntype", "none"), DYN_NONE)
                r["gaintype"] = _GAIN.get(a.get("gaintype", "fixed"), GAIN_FIXED)
                r["biastype"] = _BIAS.get(a.get("biastype", "none"), BIAS_NONE)
                for key, n in (("dynprm", 3), ("gainprm", 9), ("biasprm", 9)):
                    v = _parse_vec(a.get(key))
                    if v is not None:
                        r[key] = list(v[:n]) + [0.0] * max(0, n - len(v))
            elif tag == "position":
                kp = _parse_float(a.get("kp"), 1.0)
                kv = _parse_float(a.get("kv"), 0.0)
                r["gainprm"] = [kp] + [0.0] * 8
                r["biastype"] = BIAS_AFFINE
                r["biasprm"] = [0.0, -kp, -kv] + [0.0] * 6
                tc = _parse_float(a.get("timeconst"), 0.0)
                if tc > 0.0:
                    r["dyntype"] = DYN_FILTEREXACT
                    r["dynprm"] = [tc, 0.0, 0.0]
            elif tag == "velocity":
                kv = _parse_float(a.get("kv"), 1.0)
                r["gainprm"] = [kv] + [0.0] * 8
                r["biastype"] = BIAS_AFFINE
                r["biasprm"] = [0.0, 0.0, -kv] + [0.0] * 6
            elif tag == "intvelocity":
                kp = _parse_float(a.get("kp"), 1.0)
                kv = _parse_float(a.get("kv"), 0.0)
                r["dyntype"] = DYN_INTEGRATOR
                r["gainprm"] = [kp] + [0.0] * 8
                r["biastype"] = BIAS_AFFINE
                r["biasprm"] = [0.0, -kp, -kv] + [0.0] * 6
                if ar is None:
                    r["actrange"] = r["ctrlrange"]
            elif tag == "damper":
                kv = _parse_float(a.get("kv"), 1.0)
                r["gaintype"] = GAIN_AFFINE
                r["gainprm"] = [0.0, 0.0, -kv] + [0.0] * 6
            elif tag == "cylinder":
                area = _parse_float(a.get("area"), 1.0)
                dia = a.get("diameter")
                if dia is not None:
                    area = math.pi * float(dia) ** 2 / 4.0
                tc = _parse_float(a.get("timeconst"), 1.0)
                r["dyntype"] = DYN_FILTER
                r["dynprm"] = [tc, 0.0, 0.0]
                r["gainprm"] = [area] + [0.0] * 8
                b = _parse_vec(a.get("bias"), default=[0, 0, 0], n=3)
                if np.any(b != 0):
                    r["biastype"] = BIAS_AFFINE
                    r["biasprm"] = list(b) + [0.0] * 6
            elif tag == "muscle":
                tc = _parse_vec(a.get("timeconst"), default=[0.01, 0.04], n=2)
                r["dyntype"] = DYN_MUSCLE
                r["dynprm"] = [tc[0], tc[1],
                               _parse_float(a.get("tausmooth"), 0.0)]
                rg = _parse_vec(a.get("range"), default=[0.75, 1.05], n=2)
                prm = [rg[0], rg[1],
                       _parse_float(a.get("force"), -1.0),
                       _parse_float(a.get("scale"), 200.0),
                       _parse_float(a.get("lmin"), 0.5),
                       _parse_float(a.get("lmax"), 1.6),
                       _parse_float(a.get("vmax"), 1.5),
                       _parse_float(a.get("fpmax"), 1.3),
                       _parse_float(a.get("fvmax"), 1.2)]
                r["gaintype"] = GAIN_MUSCLE
                r["biastype"] = BIAS_MUSCLE
                r["gainprm"] = list(prm)
                r["biasprm"] = list(prm)
                if r["ctrlrange"] is None:
                    r["ctrlrange"] = np.array([0.0, 1.0])
            else:
                continue
            recs.append(r)

            if trn[0] == "joint":
                dof = trn[1]
                crv = r["ctrlrange"] if r["ctrlrange"] is not None \
                    else np.array([-MAXVAL, MAXVAL])
                builder.add_custom_values("mjc:actuator_gear", {dof: gear})
                builder.add_custom_values("mjc:actuator_ctrlrange_lo",
                                          {dof: float(crv[0])})
                builder.add_custom_values("mjc:actuator_ctrlrange_hi",
                                          {dof: float(crv[1])})
                if actuation == "pd":
                    if tag == "position":
                        builder.joint_target_ke[dof] = \
                            _parse_float(a.get("kp"), 1.0) * gear
                        kv = a.get("kv")
                        if kv is not None:
                            builder.joint_target_kd[dof] = float(kv) * gear
                    elif tag == "velocity":
                        builder.joint_target_kd[dof] = \
                            _parse_float(a.get("kv"), 1.0) * gear
                actuators.append(dict(
                    name=r["name"], joint=jname, dof=dof, gear=gear, type=tag,
                    ctrlrange=(float(crv[0]), float(crv[1]))))
            else:
                actuators.append(dict(name=r["name"], tendon=trn[1],
                                      gear=gear, type=tag))

        if recs and actuation == "mjc":
            au = MJCActuation(len(recs))
            for i, r in enumerate(recs):
                if r["trn"][0] == "joint":
                    au.dof[i] = r["trn"][1]
                    au.coord[i] = r["trn"][2]
                elif r["trn"][0] == "sten":
                    au.sten[i] = r["trn"][1]
                else:
                    au.tendon[i] = r["trn"][1]
                au.gear[i] = r["gear"]
                au.dyntype[i] = r["dyntype"]
                au.dynprm[i] = r["dynprm"]
                au.gaintype[i] = r["gaintype"]
                au.gainprm[i] = r["gainprm"]
                au.biastype[i] = r["biastype"]
                au.biasprm[i] = r["biasprm"]
                for key, rng, lim in (("ctrlrange", au.ctrlrange, au.ctrllimited),
                                      ("forcerange", au.forcerange, au.forcelimited),
                                      ("actrange", au.actrange, au.actlimited)):
                    v = r[key]
                    if v is not None and (v[0] != 0.0 or v[1] != 0.0):
                        rng[i] = v
                        lim[i] = True
                # muscle lengthrange from the joint range (matches MuJoCo's
                # compiled lengthrange for joint-transmission muscles)
                if au.dof[i] >= 0:
                    lo = builder.joint_limit_lower[au.dof[i]]
                    hi = builder.joint_limit_upper[au.dof[i]]
                    lr = sorted([r["gear"] * lo, r["gear"] * hi])
                    au.lengthrange[i] = lr
                elif au.sten[i] >= 0 and r["gaintype"] == GAIN_MUSCLE:
                    # MuJoCo computes actuator_lengthrange by a limit
                    # simulation; approximate by assuming the build pose
                    # sits at the middle of the muscle operating `range`
                    # [r0, r1] (units of optimal fiber length)
                    from ..sim.tendon import spatial_tendon_rest_length
                    Lb = spatial_tendon_rest_length(
                        builder.sten_paths[au.sten[i]], builder.body_q)
                    rg = r["gainprm"][:2]
                    mid = max(0.5 * (rg[0] + rg[1]), 1e-9)
                    lopt = Lb / mid
                    au.lengthrange[i] = sorted([r["gear"] * rg[0] * lopt,
                                                r["gear"] * rg[1] * lopt])
            au.finish()
            builder.mjc_actuation = au
            A = len(recs)
            builder.add_custom_attribute(
                "mjc:ctrl", AttributeFrequency.ONCE, shape=(A,),
                assignment=AttributeAssignment.CONTROL, default=0.0)
            if au.has_act:
                builder.add_custom_attribute(
                    "mjc:act", AttributeFrequency.ONCE, shape=(A,),
                    assignment=AttributeAssignment.STATE, default=0.0)

    # ---------------- contact excludes / pairs ----------------
    contact = root.find("contact")
    if contact is not None:
        for ex in contact.findall("exclude"):
            b1 = name_to_body.get(ex.get("body1", ""))
            b2 = name_to_body.get(ex.get("body2", ""))
            if b1 is not None and b2 is not None and b1 >= 0 and b2 >= 0:
                builder._filter_body_pair(b1, b2)

    # ---------------- equality ----------------
    eq_root = root.find("equality")
    if eq_root is not None:
        for eq in eq_root:
            if eq.tag == "connect":
                b1 = name_to_body.get(eq.get("body1", ""), -1)
                b2 = name_to_body.get(eq.get("body2", ""), -1)
                anchor = _parse_vec(eq.get("anchor"), default=[0, 0, 0], n=3) * scale
                builder.add_equality_constraint(EqType.CONNECT, body1=b1, body2=b2,
                                                anchor=anchor, key=eq.get("name"))
            elif eq.tag == "weld":
                b1 = name_to_body.get(eq.get("body1", ""), -1)
                b2 = name_to_body.get(eq.get("body2", ""), -1)
                builder.add_equality_constraint(EqType.WELD, body1=b1, body2=b2,
                                                key=eq.get("name"))
            elif eq.tag == "joint":
                j1 = name_to_joint.get(eq.get("joint1", ""), -1)
                j2 = name_to_joint.get(eq.get("joint2", ""), -1)
                pc = _parse_vec(eq.get("polycoef"), default=[0, 1, 0, 0, 0], n=5)
                builder.add_equality_constraint(EqType.JOINT, joint1=j1, joint2=j2,
                                                polycoef=pc, key=eq.get("name"))

    # init_qpos from <custom><numeric name="init_qpos"> (gym-style models)
    custom_elem = root.find("custom")
    if custom_elem is not None:
        for num in custom_elem.findall("numeric"):
            if num.get("name") == "init_qpos":
                qpos = _parse_vec(num.get("data"))
                if qpos is not None and len(qpos) <= builder.joint_coord_count:
                    # MuJoCo free joint coords are [p(3), q_wxyz(4)]
                    qpos = _mjc_qpos_to_newton(builder, qpos)
                    builder.joint_q[:len(qpos)] = list(qpos)

    return dict(bodies=name_to_body, joints=name_to_joint, shapes=name_to_shape,
                actuators=actuators, joint_dof_start=joint_dof_start,
                joint_coord_start=joint_coord_start)


def _mjc_qpos_to_newton(builder, qpos: np.ndarray) -> np.ndarray:
    """Convert MuJoCo qpos ordering (free: pos + wxyz quat; ball: wxyz) to the
    builder's layout (free: pos + xyzw; ball: xyzw)."""
    out = np.array(qpos, dtype=np.float64)
    i = 0
    for j, t in enumerate(builder.joint_type):
        t = JointType(t)
        nq = builder.joint_q_start[j + 1] - builder.joint_q_start[j]
        if i + nq > len(out):
            break
        if t in (JointType.FREE, JointType.DISTANCE):
            w = out[i + 3]
            out[i + 3:i + 6] = out[i + 4:i + 7]
            out[i + 6] = w
        elif t == JointType.BALL:
            w = out[i]
            out[i:i + 3] = out[i + 1:i + 4]
            out[i + 3] = w
        i += nq
    return out


def _load_mesh_file(path: str) -> Optional[Mesh]:
    """Load STL/OBJ meshes without external deps."""
    try:
        ext = os.path.splitext(path)[1].lower()
        if ext == ".stl":
            return _load_stl(path)
        if ext == ".obj":
            return _load_obj(path)
    except Exception:
        return None
    return None


def _load_stl(path: str) -> Mesh:
    with open(path, "rb") as f:
        header = f.read(80)
        import struct
        count = struct.unpack("<I", f.read(4))[0]
        data = np.frombuffer(f.read(count * 50), dtype=np.uint8)
        tri = data.reshape(count, 50)
        verts = tri[:, 12:48].copy().view(np.float32).reshape(count, 3, 3)
    flat = verts.reshape(-1, 3).astype(np.float64)
    uniq, inv = np.unique(np.round(flat, 8), axis=0, return_inverse=True)
    return Mesh(uniq, inv.astype(np.int32))


def _load_obj(path: str) -> Mesh:
    vs, fs = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                vs.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(t.split("/")[0]) - 1 for t in line.split()[1:]]
                for k in range(1, len(idx) - 1):
                    fs.append([idx[0], idx[k], idx[k + 1]])
    return Mesh(np.asarray(vs), np.asarray(fs, dtype=np.int32).reshape(-1))
