"""Example smoke tests: every example runs headless for a few frames and
passes its own test_final (reference: newton/tests/test_examples.py — the
reference runs each example as a subprocess with --viewer null)."""

import importlib

import numpy as np
import pytest

from newton_tpu.examples import EXAMPLES
from newton_tpu.viewer import ViewerNull

# the example sweep is the largest compile surface in the suite — keep it
# in the full run but out of the fast tier
pytestmark = [pytest.mark.slow, pytest.mark.examples]


class _Args:
    num_frames = 8
    num_worlds = 2
    test = True
    benchmark = False


# examples whose test_final needs a longer run than the 8-frame smoke
FRAMES = {
    "basic_sphere": 30, "selection_reset": 30, "basic_dzhanibekov": 30,
    "basic_joints": 30, "contact_restitution": 60, "mujoco_sleeping": 60,
    "pyramid": 40, "diffsim_ball": 8, "diffsim_spring_cage": 8,
    "cloth_twist": 60, "softbody_hanging": 40, "robot_cartpole": 50,
    "recording": 10, "basic_conveyor": 30, "domino_spiral": 110,
    "brick_stacking": 25, "basic_urdf": 15,
    "softbody_dropping_to_cloth": 30, "rigid_soft_contact": 40,
    "selection_materials": 70, "cloth_bending": 40,
    "mpm_snow_ball": 25, "mpm_viscous": 25, "cable_dahl_hysteresis": 65, "basic_shapes": 60, "mpm_multi_material": 25, "basic_plotting": 40,
    "selection_articulations": 50, "kamino_heterogeneous": 40, "cloth_style3d": 50, "balance_bird": 60,
    "multi_solver_overlay": 60, "cable_y_junction": 50,
    "newton_cradle": 130, "cloth_rollers": 70,
    "diffsim_cloth": 8, "diffsim_drone": 50, "diffsim_soft_body": 8,
    "nut_bolt_sdf": 120, "gripper_soft": 100, "cable_pile": 140,
    "robot_hand": 30, "robot_kitchen": 25, "tendon_finger": 200,
    "hetero_worlds": 45, "robot_policy": 40, "cloth_hanging": 45,
    "cable_bend_stiffness": 70, "compliant_pad": 120,
    "basic_conveyor_forces": 60, "replay_viewer": 20, "ik_custom": 30,
    "vbd_rigid_rigid_contact": 50,
    "mpm_granular": 60, "peg_insertion": 80, "xpbd_vbd_coupled": 40,
    "cloth_stiff_material_hanging": 60, "robot_arm_reach": 120,
    "selection_cartpole": 50, "kamino_mass_ratio": 60,
    "selection_multiple": 20, "pile_sap": 8,
    "robot_walker2d": 30, "robot_cheetah": 30, "cable_twist": 120,
    "cloth_poker_cards": 80, "mpm_beam_twist": 30,
    "controller_impedance_hetero": 120, "ik_franka": 10,
    "mujoco_xpbd_coupled": 60,
}


@pytest.mark.parametrize("name", sorted(EXAMPLES))
def test_example_headless(name):
    module = importlib.import_module(EXAMPLES[name])
    viewer = ViewerNull(max_frames=_Args.num_frames)
    example = module.Example(viewer, _Args())
    frames = FRAMES.get(name, 8)
    for _ in range(frames):
        example.step()
        example.render()
    # NaN sweep (reference examples/__init__.py:587-600)
    state = getattr(example, "state", None)
    if state is not None:
        for attr in ("body_q", "body_qd", "particle_q", "joint_q"):
            arr = np.asarray(getattr(state, attr))
            assert np.isfinite(arr).all(), f"{name}: non-finite {attr}"
    # every example that defines test_final gets it run (ADVICE r3: the
    # FRAMES gate silently skipped new examples' blow-up assertions)
    if hasattr(example, "test_final"):
        example.test_final()


def test_cli_main_lists_examples(capsys):
    from newton_tpu.examples import main
    assert main([]) == 1
    out = capsys.readouterr().out
    assert "basic_pendulum" in out
