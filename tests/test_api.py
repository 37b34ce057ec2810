"""Public API surface gate (reference: newton/tests/test_api.py).

A drop-in user of the reference must find every top-level entry point.
This test pins the public surface so accidental removals fail loudly.
"""

import importlib

import pytest

import newton_tpu as nt

TOP_LEVEL = [
    "ModelBuilder", "Model", "State", "Control", "Contacts",
    "ShapeConfig", "JointDofConfig", "Mesh", "Axis", "GeoType",
    "JointType", "EqType",
]

SOLVERS = [
    "SolverBase", "SolverSemiImplicit", "SolverXPBD", "SolverVBD",
    "SolverFeatherstone", "SolverMuJoCo", "SolverStyle3D",
    "SolverImplicitMPM", "SolverMPM", "SolverKamino", "SolverCoupled",
]

VIEWERS = [
    "ViewerBase", "ViewerNull", "ViewerFile", "ViewerGL", "ViewerUSD",
    "ViewerRerun", "ViewerViser",
]

MODULES = [
    "newton_tpu.sim.builder", "newton_tpu.sim.collide",
    "newton_tpu.sim.articulation", "newton_tpu.sim.graph_coloring",
    "newton_tpu.geometry.broad_phase", "newton_tpu.geometry.narrow_phase",
    "newton_tpu.geometry.mpr", "newton_tpu.geometry.sdf",
    "newton_tpu.geometry.raycast", "newton_tpu.geometry.hashgrid",
    "newton_tpu.geometry.terrain", "newton_tpu.geometry.remesh",
    "newton_tpu.ik.ik_solver", "newton_tpu.utils.import_mjcf",
    "newton_tpu.utils.import_urdf", "newton_tpu.utils.import_usd",
    "newton_tpu.usd.usdc", "newton_tpu.utils.selection",
    "newton_tpu.utils.checkpoint", "newton_tpu.utils.benchmark",
    "newton_tpu.sensors.sensor_imu", "newton_tpu.sensors.sensor_contact",
    "newton_tpu.sensors.sensor_frame_transform",
    "newton_tpu.sensors.sensor_tiled_camera",
    "newton_tpu.actuators.actuator", "newton_tpu.controllers",
    "newton_tpu.parallel", "newton_tpu.solvers.mpm_pallas",
    "newton_tpu.solvers.generalized.pgs_pallas",
]


@pytest.mark.parametrize("name", TOP_LEVEL)
def test_top_level_symbol(name):
    assert hasattr(nt, name), f"newton_tpu.{name} missing"


@pytest.mark.parametrize("name", SOLVERS)
def test_solver_symbol(name):
    import newton_tpu.solvers as solvers
    assert hasattr(solvers, name), f"newton_tpu.solvers.{name} missing"


@pytest.mark.parametrize("name", VIEWERS)
def test_viewer_symbol(name):
    import newton_tpu.viewer as viewer
    assert hasattr(viewer, name), f"newton_tpu.viewer.{name} missing"


@pytest.mark.parametrize("mod", MODULES)
def test_module_imports(mod):
    importlib.import_module(mod)


def test_builder_add_surface():
    """The ModelBuilder authoring surface a reference user relies on."""
    methods = [
        "add_body", "add_shape_sphere", "add_shape_box", "add_shape_capsule",
        "add_shape_cylinder", "add_shape_cone", "add_shape_mesh",
        "add_shape_convex_hull", "add_shape_plane", "add_ground_plane",
        "add_joint_free", "add_joint_revolute", "add_joint_prismatic",
        "add_joint_ball", "add_joint_fixed", "add_joint_d6",
        "add_joint_distance", "add_particle", "add_cloth_grid",
        "add_cloth_mesh", "add_soft_grid", "add_soft_mesh", "add_muscle",
        "add_equality_constraint", "add_mjcf", "add_urdf", "add_usd",
        "add_articulation", "begin_world", "end_world", "replicate",
        "collapse_fixed_joints", "approximate_meshes", "color",
        "add_custom_attribute", "finalize",
    ]
    missing = [m for m in methods if not hasattr(nt.ModelBuilder, m)]
    assert not missing, f"ModelBuilder missing: {missing}"


def test_solver_step_signature():
    """Every solver exposes step(state_in, state_out, control, contacts, dt)
    (the reference SolverBase contract, solver.py:110)."""
    import inspect

    import newton_tpu.solvers as S
    for name in SOLVERS:
        cls = getattr(S, name)
        if name in ("SolverBase", "SolverCoupled"):
            continue
        sig = inspect.signature(cls.step)
        params = list(sig.parameters)
        assert params[1:3] == ["state_in", "state_out"], (name, params)
