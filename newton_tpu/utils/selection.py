"""ArticulationView: Isaac-Lab-style batched RL access to articulations.

TPU-native re-design of reference newton/_src/utils/selection.py:500 (2078
LoC). The reference builds gather/scatter kernels and zero-copy views over
Warp arrays; here every accessor is a static-index gather (free under jit)
and every setter returns a functionally-updated State/Control/Model —
`view.set_dof_positions(state, x)` composes with vmap/jit/grad.

Shapes: all accessors are batched `(count, ...)` over matched articulations,
ordered world-major — for a replicated RL scene this is exactly
`(num_envs, ...)`.
"""

from __future__ import annotations

import fnmatch
import re
from typing import List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

from ..math import quat_rotate
from ..sim.articulation import eval_fk
from ..sim.control import Control
from ..sim.enums import JointType
from ..sim.model import Model
from ..sim.state import State

__all__ = ["ArticulationView", "match_labels"]


def match_labels(keys: List[str], pattern) -> List[int]:
    """Match entity keys by glob/regex/explicit indices
    (reference: selection.py:426)."""
    if pattern is None or pattern == "*":
        return list(range(len(keys)))
    if isinstance(pattern, (list, tuple, np.ndarray)) and len(pattern) \
            and isinstance(pattern[0], (int, np.integer)):
        return [int(i) for i in pattern]
    if isinstance(pattern, (list, tuple)):
        out = []
        for p in pattern:
            out.extend(match_labels(keys, p))
        return sorted(set(out))
    matched = [i for i, k in enumerate(keys) if fnmatch.fnmatch(k, pattern)]
    if not matched:
        try:
            rx = re.compile(pattern)
            matched = [i for i, k in enumerate(keys) if rx.search(k)]
        except re.error:
            pass
    return matched


class ArticulationView:
    """Batched view over articulations matched by key pattern
    (reference: selection.py:500).

    Args:
        model: finalized Model.
        pattern: glob/regex over articulation keys, or explicit indices.
        exclude_joint_types: joint types dropped from the dof set (the
            reference's include/exclude joint filtering).
    """

    def __init__(self, model: Model, pattern="*", verbose: bool = False,
                 exclude_joint_types: Sequence[JointType] = ()):
        self.model = model
        st = model.structure
        self.articulation_indices = match_labels(st.articulation_key, pattern)
        if not self.articulation_indices:
            raise ValueError(f"No articulations match {pattern!r}")
        arts = self.articulation_indices
        art_start = st.articulation_start
        excl = {int(t) for t in exclude_joint_types}

        dof_rows, coord_rows, link_rows, joint_rows = [], [], [], []
        root_joint, root_body = [], []
        for a in arts:
            j0, j1 = int(art_start[a]), int(art_start[a + 1])
            dofs, coords, joints = [], [], []
            links = []
            for j in range(j0, j1):
                links.append(int(st.joint_child[j]))
                if int(st.joint_type[j]) in excl:
                    continue
                joints.append(j)
                dofs.extend(range(int(st.joint_qd_start[j]),
                                  int(st.joint_qd_start[j + 1])))
                coords.extend(range(int(st.joint_q_start[j]),
                                    int(st.joint_q_start[j + 1])))
            dof_rows.append(dofs)
            coord_rows.append(coords)
            link_rows.append(sorted(set(links)))
            joint_rows.append(joints)
            root_joint.append(j0)
            root_body.append(int(st.joint_child[j0]))
        d = {len(r) for r in dof_rows}
        if len(d) != 1:
            raise ValueError("Matched articulations have differing dof counts; "
                             "narrow the pattern")
        self.dof_idx = np.asarray(dof_rows, dtype=np.int32)       # (n, d)
        self.coord_idx = np.asarray(coord_rows, dtype=np.int32)   # (n, nq)
        self.link_idx = np.asarray(link_rows, dtype=np.int32)     # (n, L)
        # per-articulation shape rows (shape-frequency attribute access,
        # e.g. contact materials; reference selection.py AttributeSpec
        # frequency metadata covers shapes the same way)
        shape_body = np.asarray(st.shape_body)
        shape_rows = [sorted(int(s) for s in
                             np.nonzero(np.isin(shape_body, links))[0])
                      for links in link_rows]
        s_lens = {len(r) for r in shape_rows}
        self.shape_idx = (np.asarray(shape_rows, dtype=np.int32)
                          if len(s_lens) == 1 and shape_rows[0] else None)
        self.joint_idx = np.asarray(joint_rows, dtype=np.int32)
        self.root_joint = np.asarray(root_joint, dtype=np.int32)
        self.root_body = np.asarray(root_body, dtype=np.int32)
        self.count = len(arts)
        self.joint_dof_count = self.dof_idx.shape[1]
        self.joint_coord_count = self.coord_idx.shape[1]
        self.link_count = self.link_idx.shape[1]
        rt = st.joint_type[self.root_joint]
        self.root_is_free = bool(len(rt)) and bool(
            (rt == int(JointType.FREE)).all())
        # coord index of the root free joint (n, 7) / dof (n, 6)
        if self.root_is_free:
            q0 = st.joint_q_start[self.root_joint]
            d0 = st.joint_qd_start[self.root_joint]
            self._root_q = q0[:, None] + np.arange(7)[None, :]
            self._root_qd = d0[:, None] + np.arange(6)[None, :]
        # dof/coord keys for introspection
        self.joint_names = [st.joint_key[j] for j in joint_rows[0]] \
            if joint_rows and joint_rows[0] else []
        self._mask_template = np.zeros(st.articulation_count, dtype=bool)
        self._mask_template[arts] = True

    # ------------------------------------------------------------------
    # generic attribute access (reference: selection.py:1441-1454)
    # ------------------------------------------------------------------
    def get_attribute(self, name: str, source):
        """Gather a model/state/control attribute batched over the view.

        Frequency is inferred from the array's leading size."""
        arr = getattr(source, name, None)
        if arr is None and hasattr(source, "custom"):
            arr = source.custom.get(name)
        if arr is None:
            raise AttributeError(name)
        st = self.model.structure
        n0 = arr.shape[0]
        if n0 == st.joint_dof_count:
            return arr[self.dof_idx]
        if n0 == st.joint_coord_count:
            return arr[self.coord_idx]
        if n0 == st.body_count:
            return arr[self.link_idx]
        if n0 == st.joint_count:
            return arr[self.joint_idx]
        if n0 == st.articulation_count:
            return arr[np.asarray(self.articulation_indices)]
        if n0 == st.shape_count and self.shape_idx is not None:
            return arr[self.shape_idx]
        raise ValueError(f"Cannot infer frequency for {name} (len {n0})")

    def set_attribute(self, name: str, source, values, mask=None):
        arr = self.get_attribute(name, source)  # validates + infers shape
        st = self.model.structure
        full = getattr(source, name, None)
        key = None
        if full is None:
            full = source.custom[name]
            key = name
        n0 = full.shape[0]
        if n0 == st.joint_dof_count:
            idx = self.dof_idx
        elif n0 == st.joint_coord_count:
            idx = self.coord_idx
        elif n0 == st.body_count:
            idx = self.link_idx
        elif n0 == st.joint_count:
            idx = self.joint_idx
        elif n0 == st.shape_count and self.shape_idx is not None:
            idx = self.shape_idx
        else:
            idx = np.asarray(self.articulation_indices)
        values = jnp.asarray(values, dtype=full.dtype)
        if mask is not None:
            values = jnp.where(
                jnp.asarray(mask).reshape((-1,) + (1,) * (values.ndim - 1)),
                values, full[idx])
        new = full.at[idx].set(values)
        if key is not None:
            custom = dict(source.custom)
            custom[key] = new
            return source.replace(custom=custom)
        return source.replace(**{name: new})

    # ------------------------------------------------------------------
    # dof state (reference: selection.py:1587-1673)
    # ------------------------------------------------------------------
    def get_dof_positions(self, state: State) -> jnp.ndarray:
        return state.joint_q[self.coord_idx]

    def get_dof_velocities(self, state: State) -> jnp.ndarray:
        return state.joint_qd[self.dof_idx]

    def set_dof_positions(self, state: State, q, mask=None) -> State:
        q = jnp.asarray(q, dtype=state.joint_q.dtype)
        if mask is not None:
            q = jnp.where(jnp.asarray(mask)[:, None], q,
                          state.joint_q[self.coord_idx])
        return state.replace(joint_q=state.joint_q.at[self.coord_idx].set(q))

    def set_dof_velocities(self, state: State, qd, mask=None) -> State:
        qd = jnp.asarray(qd, dtype=state.joint_qd.dtype)
        if mask is not None:
            qd = jnp.where(jnp.asarray(mask)[:, None], qd,
                           state.joint_qd[self.dof_idx])
        return state.replace(joint_qd=state.joint_qd.at[self.dof_idx].set(qd))

    def get_dof_forces(self, control: Control) -> jnp.ndarray:
        return control.joint_f[self.dof_idx]

    def set_dof_forces(self, control: Control, f, mask=None) -> Control:
        f = jnp.asarray(f, dtype=control.joint_f.dtype)
        if mask is not None:
            f = jnp.where(jnp.asarray(mask)[:, None], f,
                          control.joint_f[self.dof_idx])
        return control.replace(joint_f=control.joint_f.at[self.dof_idx].set(f))

    def get_dof_position_targets(self, control: Control) -> jnp.ndarray:
        return control.joint_target_q[self.coord_idx]

    def set_dof_position_targets(self, control: Control, q) -> Control:
        return control.replace(joint_target_q=control.joint_target_q
                               .at[self.coord_idx].set(jnp.asarray(q)))

    def get_dof_velocity_targets(self, control: Control) -> jnp.ndarray:
        return control.joint_target_qd[self.dof_idx]

    def set_dof_velocity_targets(self, control: Control, qd) -> Control:
        return control.replace(joint_target_qd=control.joint_target_qd
                               .at[self.dof_idx].set(jnp.asarray(qd)))

    def get_dof_limits(self):
        lo = self.model.joint_limit_lower[self.dof_idx]
        hi = self.model.joint_limit_upper[self.dof_idx]
        return lo, hi

    # ------------------------------------------------------------------
    # root state (reference: selection.py:1480-1544)
    # ------------------------------------------------------------------
    def get_root_transforms(self, state: State) -> jnp.ndarray:
        """(count, 7) root poses. Free roots read joint coords; fixed roots
        read the root body pose."""
        if self.root_is_free:
            return state.joint_q[self._root_q]
        return state.body_q[self.root_body]

    def set_root_transforms(self, state: State, xf, mask=None) -> State:
        xf = jnp.asarray(xf, dtype=state.body_q.dtype)
        if self.root_is_free:
            if mask is not None:
                xf = jnp.where(jnp.asarray(mask)[:, None], xf,
                               state.joint_q[self._root_q])
            return state.replace(joint_q=state.joint_q.at[self._root_q].set(xf))
        if mask is not None:
            xf = jnp.where(jnp.asarray(mask)[:, None], xf,
                           state.body_q[self.root_body])
        return state.replace(body_q=state.body_q.at[self.root_body].set(xf))

    def get_root_velocities(self, state: State) -> jnp.ndarray:
        if self.root_is_free:
            return state.joint_qd[self._root_qd]
        return state.body_qd[self.root_body]

    def set_root_velocities(self, state: State, qd, mask=None) -> State:
        qd = jnp.asarray(qd, dtype=state.body_qd.dtype)
        if self.root_is_free:
            if mask is not None:
                qd = jnp.where(jnp.asarray(mask)[:, None], qd,
                               state.joint_qd[self._root_qd])
            return state.replace(
                joint_qd=state.joint_qd.at[self._root_qd].set(qd))
        if mask is not None:
            qd = jnp.where(jnp.asarray(mask)[:, None], qd,
                           state.body_qd[self.root_body])
        return state.replace(body_qd=state.body_qd.at[self.root_body].set(qd))

    # ------------------------------------------------------------------
    # link state (reference: selection.py:1560-1572)
    # ------------------------------------------------------------------
    def get_link_transforms(self, state: State) -> jnp.ndarray:
        return state.body_q[self.link_idx]                    # (n, L, 7)

    def get_link_velocities(self, state: State) -> jnp.ndarray:
        return state.body_qd[self.link_idx]

    # ------------------------------------------------------------------
    # kinematics (reference: selection.py:1755)
    # ------------------------------------------------------------------
    def articulation_mask(self, mask=None) -> jnp.ndarray:
        full = jnp.zeros(self.model.structure.articulation_count, dtype=bool)
        sel = jnp.asarray(self._mask_template)
        if mask is None:
            return sel
        m = jnp.zeros_like(full).at[np.asarray(self.articulation_indices)] \
            .set(jnp.asarray(mask, dtype=bool))
        return m

    def eval_fk(self, state: State, mask=None) -> State:
        """Run FK only for this view's articulations
        (reference: selection.py:1755)."""
        return eval_fk(self.model, state.joint_q, state.joint_qd, state,
                       mask=self.articulation_mask(mask))

    # ------------------------------------------------------------------
    # per-view dynamics (reference: selection.py:1755-1925)
    # ------------------------------------------------------------------
    def _group_rows(self):
        """(group, row-indices) of this view's articulations in the
        generalized-dynamics batch layout."""
        from ..solvers.generalized.dynamics import get_generalized_cache
        gc = get_generalized_cache(self.model.structure)
        want = set(self.articulation_indices)
        for g in gc.groups:
            rows = [i for i, a in enumerate(g.arts) if a in want]
            if len(rows) == len(want):
                return g, np.asarray(rows, dtype=np.int32)
        raise ValueError("view articulations span multiple topology groups; "
                         "narrow the pattern")

    def eval_mass_matrix(self, state: State) -> jnp.ndarray:
        """(n, d, d) joint-space mass matrices for the view
        (reference: selection.py get_mass_matrices)."""
        from ..sim.dynamics_api import eval_mass_matrix
        from ..solvers.generalized.dynamics import get_generalized_cache
        g, rows = self._group_rows()
        gc = get_generalized_cache(self.model.structure)
        gi = gc.groups.index(g)
        return eval_mass_matrix(self.model, state)[gi][rows]

    def eval_jacobian(self, state: State) -> jnp.ndarray:
        """(n, links, 6, d) body Jacobians for the view
        (reference: selection.py get_jacobians)."""
        from ..sim.dynamics_api import eval_jacobian
        from ..solvers.generalized.dynamics import get_generalized_cache
        g, rows = self._group_rows()
        gc = get_generalized_cache(self.model.structure)
        gi = gc.groups.index(g)
        return eval_jacobian(self.model, state)[gi][rows]

    def eval_inverse_dynamics(self, state: State, qdd=None) -> jnp.ndarray:
        """(n, d) generalized forces realizing qdd at the current state
        (reference: selection.py inverse-dynamics accessors)."""
        from ..sim.dynamics_api import eval_inverse_dynamics
        full = None
        if qdd is not None:
            full = jnp.zeros_like(state.joint_qd)
            full = full.at[self.dof_idx.reshape(-1)].set(
                jnp.asarray(qdd).reshape(-1))
        tau = eval_inverse_dynamics(self.model, state, full)
        return tau[self.dof_idx]

    # ------------------------------------------------------------------
    # actuator gain access (reference: selection.py:1990-2030)
    # ------------------------------------------------------------------
    def get_gains(self):
        """(n, d) (kp, kd) PD drive gains over the view's dofs."""
        return (self.model.joint_target_ke[self.dof_idx],
                self.model.joint_target_kd[self.dof_idx])

    def set_gains(self, kp=None, kd=None) -> Model:
        """Return a new Model with the view's PD gains replaced (the Model
        pytree is frozen; reference mutates in place)."""
        m = self.model
        flat = self.dof_idx.reshape(-1)
        if kp is not None:
            ke = m.joint_target_ke.at[flat].set(
                jnp.broadcast_to(jnp.asarray(kp, dtype=m.joint_target_ke.dtype),
                                 self.dof_idx.shape).reshape(-1))
            m = m.replace(joint_target_ke=ke)
        if kd is not None:
            kdv = m.joint_target_kd.at[flat].set(
                jnp.broadcast_to(jnp.asarray(kd, dtype=m.joint_target_kd.dtype),
                                 self.dof_idx.shape).reshape(-1))
            m = m.replace(joint_target_kd=kdv)
        self.model = m
        return m
