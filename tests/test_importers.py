"""Importer tests (reference: test_import_mjcf.py, test_import_urdf*)."""

import numpy as np
import pytest

import newton_tpu as nt

ANT = ("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/assets/"
       "ant.xml")
HUMANOID = ("/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/"
            "assets/humanoid.xml")

URDF = """
<robot name="two_link">
  <link name="base">
    <inertial><mass value="1.0"/><origin xyz="0 0 0"/>
      <inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision><geometry><box size="0.2 0.2 0.2"/></geometry></collision>
  </link>
  <link name="arm">
    <inertial><mass value="0.5"/><origin xyz="0.25 0 0"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision><origin xyz="0.25 0 0"/>
      <geometry><cylinder radius="0.05" length="0.5"/></geometry></collision>
  </link>
  <joint name="shoulder" type="revolute">
    <parent link="base"/><child link="arm"/>
    <origin xyz="0 0 0.1" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
    <limit lower="-1.57" upper="1.57" effort="10" velocity="2"/>
    <dynamics damping="0.1"/>
  </joint>
</robot>
"""


def test_mjcf_ant_structure():
    b = nt.ModelBuilder()
    info = b.add_mjcf(ANT)
    m = b.finalize()
    assert m.body_count == 13
    assert m.joint_coord_count == 15
    assert m.joint_dof_count == 14
    assert len(info["actuators"]) == 8
    # contype/conaffinity: only floor pairs remain
    assert m.structure.candidate_pairs.shape[0] == 13
    # init_qpos applied (torso at 0.55, wxyz converted)
    np.testing.assert_allclose(np.asarray(m.joint_q0)[:7],
                               [0, 0, 0.55, 0, 0, 0, 1], atol=1e-6)
    # degrees converted to radians
    lo = np.asarray(m.joint_limit_lower)[6:]
    assert np.abs(lo).max() < np.pi


def test_mjcf_humanoid_structure():
    b = nt.ModelBuilder()
    b.add_mjcf(HUMANOID)
    m = b.finalize()
    assert m.joint_coord_count == 24
    assert m.joint_dof_count == 23


def test_urdf_import():
    b = nt.ModelBuilder()
    info = b.add_urdf(URDF, floating=False)
    m = b.finalize()
    assert m.body_count == 2
    assert m.joint_count == 2  # fixed base + revolute
    assert "shoulder" in info["joints"]
    # limits + damping wired through
    d = np.asarray(m.joint_target_kd)
    assert d[-1] == pytest.approx(0.1)
    np.testing.assert_allclose(np.asarray(m.joint_limit_lower)[-1], -1.57,
                               atol=1e-6)
    # inertial override respected
    np.testing.assert_allclose(np.asarray(m.body_mass), [1.0, 0.5], atol=1e-6)


def test_urdf_floating_and_fk():
    import jax.numpy as jnp
    from newton_tpu.sim.articulation import eval_fk
    b = nt.ModelBuilder()
    b.add_urdf(URDF, floating=True)
    m = b.finalize()
    assert m.joint_dof_count == 6 + 1
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    assert np.isfinite(np.asarray(s.body_q)).all()


def test_collapse_fixed_joints():
    b = nt.ModelBuilder()
    root = b.add_body()
    b.add_shape_box(root, hx=0.2, hy=0.2, hz=0.2)
    b.add_joint_free(root)
    child = b.add_body(xform=[0.5, 0, 0, 0, 0, 0, 1])
    b.add_shape_sphere(child, radius=0.1)
    b.add_joint_fixed(root, child, xform_p=[0.5, 0, 0, 0, 0, 0, 1])
    total = sum(b.body_mass)
    b.collapse_fixed_joints()
    assert b.body_count == 1
    assert b.joint_count == 1
    assert sum(b.body_mass) == pytest.approx(total)
    m = b.finalize()
    assert np.asarray(m.structure.shape_body).tolist() == [0, 0]


def test_mjcf_fixed_tendon_coupling():
    """Fixed tendons: L = sum coef*q with passive spring couples joints
    (reference: SolverMuJoCo fixed-tendon support + MJCF <tendon>)."""
    import jax
    import jax.numpy as jnp
    from newton_tpu.sim.articulation import eval_fk
    from newton_tpu.solvers.generalized.solver import SolverFeatherstone

    mjcf = """
    <mujoco model="tendon_test">
      <worldbody>
        <body name="l1" pos="0 0 1">
          <joint name="j1" type="hinge" axis="0 1 0"/>
          <geom type="capsule" size="0.05" fromto="0 0 0 0.4 0 0"/>
        </body>
        <body name="l2" pos="0.5 0 1">
          <joint name="j2" type="hinge" axis="0 1 0"/>
          <geom type="capsule" size="0.05" fromto="0 0 0 0.4 0 0"/>
        </body>
      </worldbody>
      <tendon>
        <fixed name="couple" stiffness="200" damping="5">
          <joint joint="j1" coef="1"/>
          <joint joint="j2" coef="-1"/>
        </fixed>
      </tendon>
    </mujoco>
    """
    b = nt.ModelBuilder()
    b.add_mjcf(mjcf)
    m = b.finalize()
    assert m.structure.tendon_count == 1
    np.testing.assert_allclose(np.asarray(m.structure.tendon_coef),
                               [[1.0, -1.0]])
    np.testing.assert_allclose(np.asarray(m.tendon_params)[0, :2], [200, 5])
    s = eval_fk(m, m.joint_q0, m.joint_qd0, m.state())
    s = s.replace(joint_qd=s.joint_qd.at[0].set(3.0))
    s = eval_fk(m, s.joint_q, s.joint_qd, s)
    solver = SolverFeatherstone(m)
    ctrl = m.control()

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, None, 1 / 480.), None
        return jax.lax.scan(sub, s, None, length=8)[0]
    for _ in range(120):
        s = frame(s)
    q = np.asarray(s.joint_q)
    assert np.isfinite(q).all()
    assert abs(q[0] - q[1]) < 0.05, f"tendon coupling broken: {q}"


def test_mjcf_spatial_tendon_first_class():
    """Spatial tendons import as first-class site-routed paths (evaluated
    by sim/tendon.py inside the step) with build-pose rest length."""
    mjcf = """
    <mujoco>
      <worldbody>
        <body name="b1" pos="0 0 1">
          <joint type="free"/><geom type="sphere" size="0.1"/>
          <site name="s1" pos="0.1 0 0"/>
        </body>
        <body name="b2" pos="1 0 1">
          <joint type="free"/><geom type="sphere" size="0.1"/>
          <site name="s2" pos="-0.1 0 0"/>
        </body>
      </worldbody>
      <tendon>
        <spatial name="sp" stiffness="7"><site site="s1"/>
          <site site="s2"/></spatial>
      </tendon>
    </mujoco>
    """
    b = nt.ModelBuilder()
    b.add_mjcf(mjcf)
    m = b.finalize()
    st = m.structure
    assert st.sten_count == 1
    assert st.sten_key == ["sp"]
    path = st.sten_paths[0]
    assert [e[0] for e in path.elems] == ["site", "site"]
    assert [e[1] for e in path.elems] == [0, 1]
    prm = np.asarray(m.sten_params)
    assert prm[0, 0] == 7.0
    # rest length = build-pose distance between the two world sites
    assert abs(prm[0, 2] - 0.8) < 1e-5

    # two-value springlength (MuJoCo deadband form) must not abort the
    # import; the lower bound is taken as rest length (ADVICE r4)
    mjcf2 = mjcf.replace('stiffness="7"',
                         'stiffness="7" springlength="0.3 0.5"')
    b2 = nt.ModelBuilder()
    b2.add_mjcf(mjcf2)
    m2 = b2.finalize()
    assert abs(np.asarray(m2.sten_params)[0, 2] - 0.3) < 1e-6


def test_usd_deformable_surface_to_cloth():
    """USD deformable surface prims become cloth particles/triangles and
    simulate (reference: import_usd_deformable_cloth.py). Also covers the
    usda array-typed attribute parse (point3f[] points)."""
    import jax
    from newton_tpu.solvers import SolverXPBD

    usda = '''#usda 1.0
    def Xform "World"
    {
        def Mesh "flag" (
            prepend apiSchemas = ["PhysxDeformableSurfaceAPI"]
        )
        {
            point3f[] points = [(0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
            int[] faceVertexIndices = [0, 1, 2, 3]
            int[] faceVertexCounts = [4]
            float physxDeformable:density = 0.5
        }
    }
    '''
    b = nt.ModelBuilder()
    b.add_usd(usda)
    m = b.finalize()
    assert m.particle_count == 4
    assert m.structure.tri_count == 2
    solver = SolverXPBD(m, iterations=4)
    s = m.state()
    ctrl = m.control()

    @jax.jit
    def frame(s):
        def sub(s, _):
            return solver.step(s, None, ctrl, None, 1 / 240.), None
        return jax.lax.scan(sub, s, None, length=4)[0]
    for _ in range(30):
        s = frame(s)
    q = np.asarray(s.particle_q)
    assert np.isfinite(q).all()
    assert q[:, 2].max() < 1.0   # cloth falls under gravity


def test_usd_deformable_cable_and_attachments():
    """BasisCurves cables -> capsule-chain rod graphs; coincident hard
    point-point curve-to-curve PhysicsAttachment welds two curves into one
    graph; a cable-to-rigid attachment lowers to a CONNECT equality
    (reference: import_usd_deformable_cable.py / ..._attachments.py)."""
    usda = '''#usda 1.0
    def Xform "World"
    {
        def Cube "anchor" (
            prepend apiSchemas = ["PhysicsRigidBodyAPI", "PhysicsCollisionAPI"]
        )
        {
            double size = 0.2
            float physics:mass = 5.0
        }
        def BasisCurves "cable_a" (
            prepend apiSchemas = ["PhysxDeformableBodyAPI"]
        )
        {
            point3f[] points = [(0, 0, 1), (0.2, 0, 1), (0.4, 0, 1)]
            int[] curveVertexCounts = [3]
            float[] widths = [0.04]
        }
        def BasisCurves "cable_b" (
            prepend apiSchemas = ["PhysxDeformableBodyAPI"]
        )
        {
            point3f[] points = [(0.4, 0, 1), (0.6, 0, 1), (0.8, 0, 1)]
            int[] curveVertexCounts = [3]
            float[] widths = [0.04]
        }
        def PhysicsAttachment "weld"
        {
            rel physics:src0 = </World/cable_a>
            rel physics:src1 = </World/cable_b>
            int[] physics:indices0 = [2]
            int[] physics:indices1 = [0]
        }
        def PhysicsAttachment "pin"
        {
            rel physics:src0 = </World/cable_a>
            rel physics:src1 = </World/anchor>
            int[] physics:indices0 = [0]
        }
    }
    '''
    b = nt.ModelBuilder()
    info = b.add_usd(usda)
    m = b.finalize()
    # 1 rigid anchor + 4 rod segments (2 per curve, welded into one graph)
    assert len(info["cables"]) == 2
    rod_bodies = info["cables"]["/World/cable_a"]
    assert len(rod_bodies) == 4
    assert m.structure.body_count == 5
    # welded: one free root for the whole graph (not one per curve)
    from newton_tpu.sim.enums import JointType
    jt = np.asarray(m.structure.joint_type)
    n_free = int((jt == int(JointType.FREE)).sum())
    assert n_free == 2, f"expected anchor+rod-root free joints, got {n_free}"
    # the pin became a CONNECT equality to the rigid anchor
    assert m.structure.eq_count == 1
    assert info["attachments"] == ["/World/pin"]


ADROIT = ("/opt/venv/lib/python3.12/site-packages/gymnasium_robotics/envs/"
          "assets/adroit_hand/adroit_pen.xml")
KITCHEN = ("/opt/venv/lib/python3.12/site-packages/gymnasium_robotics/envs/"
           "assets/kitchen_franka/kitchen_assets/kitchen_env_model.xml")


def test_mjcf_include_expansion_adroit():
    """<include> + meshdir: the 30-dof adroit hand is split across four
    include files with STL meshes under a meshdir (the reference resolves
    these through MuJoCo's own compiler, import_mjcf.py)."""
    b = nt.ModelBuilder()
    info = b.add_mjcf(ADROIT)
    m = b.finalize()
    s = m.structure
    assert s.body_count == 29
    assert m.joint_dof_count == 30
    # pen free joint -> 6 dofs of the 30; the hand contributes 24
    assert s.shape_count > 60
    assert len(info["actuators"]) > 0


def test_mjcf_include_kitchen_scene():
    """Robot-in-environment scene (franka + kitchen appliances) imports via
    nested includes across sibling asset directories."""
    b = nt.ModelBuilder()
    b.add_mjcf(KITCHEN)
    m = b.finalize()
    s = m.structure
    assert s.body_count == 43
    assert m.joint_dof_count == 29
    assert s.shape_count > 150


def test_mjcf_repeated_sections_merge():
    """MuJoCo permits repeated top-level sections; children must merge."""
    xml = """
    <mujoco>
      <worldbody>
        <body name=\"a\" pos=\"0 0 1\"><joint type=\"hinge\" axis=\"0 1 0\"/>
          <geom type=\"sphere\" size=\"0.1\"/></body>
      </worldbody>
      <worldbody>
        <body name=\"b\" pos=\"1 0 1\"><joint type=\"hinge\" axis=\"0 1 0\"/>
          <geom type=\"sphere\" size=\"0.1\"/></body>
      </worldbody>
    </mujoco>
    """
    b = nt.ModelBuilder()
    b.add_mjcf(xml)
    m = b.finalize()
    assert m.structure.body_count == 2
