"""Example framework: CLI parsing, viewer construction, run loop.

TPU-native re-design of reference newton/examples/__init__.py (init :867,
run :521, main :966). Examples are classes with
``__init__(viewer, args)`` / ``step()`` / ``render()`` / ``test_final()``;
``python -m newton_tpu.examples <name> --viewer null --num-frames 100``
runs one headlessly, matching the reference CLI shape.
"""

from __future__ import annotations

import argparse
import importlib
import sys
import time
from typing import Optional

__all__ = ["create_parser", "init", "run", "main", "EXAMPLES"]

EXAMPLES = {
    "compliant_pad": "newton_tpu.examples.example_compliant_pad",
    "newton_cradle": "newton_tpu.examples.example_newton_cradle",
    "diffsim_cloth": "newton_tpu.examples.example_diffsim_cloth",
    "diffsim_drone": "newton_tpu.examples.example_diffsim_drone",
    "diffsim_soft_body": "newton_tpu.examples.example_diffsim_soft_body",
    "cloth_rollers": "newton_tpu.examples.example_cloth_rollers",
    "box_pile": "newton_tpu.examples.example_box_pile",
    "fourbar_kamino": "newton_tpu.examples.example_fourbar_kamino",
    "convex_stack": "newton_tpu.examples.example_convex_stack",
    "heavy_stack_kamino": "newton_tpu.examples.example_heavy_stack_kamino",
    "usd_roundtrip": "newton_tpu.examples.example_usd_roundtrip",
    "sensor_imu": "newton_tpu.examples.example_sensor_imu",
    "contact_forces": "newton_tpu.examples.example_contact_forces",
    "hetero_worlds": "newton_tpu.examples.example_hetero_worlds",
    "soft_volume": "newton_tpu.examples.example_soft_volume",
    "ant_sharded": "newton_tpu.examples.example_ant_sharded",
    "basic_pendulum": "newton_tpu.examples.example_basic_pendulum",
    "basic_sphere": "newton_tpu.examples.example_basic_sphere",
    "robot_ant": "newton_tpu.examples.example_robot_ant",
    "robot_humanoid_batch": "newton_tpu.examples.example_robot_humanoid_batch",
    "cloth_hanging": "newton_tpu.examples.example_cloth_hanging",
    "selection_reset": "newton_tpu.examples.example_selection_reset",
    "mpm_sand": "newton_tpu.examples.example_mpm_sand",
    "coupled_cloth_ball": "newton_tpu.examples.example_coupled_cloth_ball",
    "camera_sensor": "newton_tpu.examples.example_camera_sensor",
    "robot_policy": "newton_tpu.examples.example_robot_policy",
    "rod_swing": "newton_tpu.examples.example_rod_swing",
    "muscle": "newton_tpu.examples.example_muscle",
    "mesh_stack": "newton_tpu.examples.example_mesh_stack",
    "ik_reach": "newton_tpu.examples.example_ik_reach",
    "terrain_ant": "newton_tpu.examples.example_terrain_ant",
    "basic_dzhanibekov": "newton_tpu.examples.example_basic_dzhanibekov",
    "basic_joints": "newton_tpu.examples.example_basic_joints",
    "contact_restitution":
        "newton_tpu.examples.example_contact_restitution",
    "mujoco_sleeping": "newton_tpu.examples.example_mujoco_sleeping",
    "pyramid": "newton_tpu.examples.example_pyramid",
    "diffsim_ball": "newton_tpu.examples.example_diffsim_ball",
    "diffsim_spring_cage":
        "newton_tpu.examples.example_diffsim_spring_cage",
    "cloth_twist": "newton_tpu.examples.example_cloth_twist",
    "softbody_hanging": "newton_tpu.examples.example_softbody_hanging",
    "robot_cartpole": "newton_tpu.examples.example_robot_cartpole",
    "recording": "newton_tpu.examples.example_recording",
    "cable_bend_stiffness":
        "newton_tpu.examples.example_cable_bend_stiffness",
    "cable_twist_transfer":
        "newton_tpu.examples.example_cable_twist_transfer",
    "basic_conveyor": "newton_tpu.examples.example_basic_conveyor",
    "basic_conveyor_forces":
        "newton_tpu.examples.example_basic_conveyor_forces",
    "pile_sap": "newton_tpu.examples.example_pile_sap",
    "ik_custom": "newton_tpu.examples.example_ik_custom",
    "robot_arm_reach": "newton_tpu.examples.example_robot_arm_reach",
    "selection_cartpole": "newton_tpu.examples.example_selection_cartpole",
    "kamino_mass_ratio": "newton_tpu.examples.example_kamino_mass_ratio",
    "vbd_rigid_rigid_contact":
        "newton_tpu.examples.example_vbd_rigid_rigid_contact",
    "mpm_granular": "newton_tpu.examples.example_mpm_granular",
    "peg_insertion": "newton_tpu.examples.example_peg_insertion",
    "xpbd_vbd_coupled": "newton_tpu.examples.example_xpbd_vbd_coupled",
    "robot_walker2d": "newton_tpu.examples.example_robot_walker2d",
    "robot_cheetah": "newton_tpu.examples.example_robot_cheetah",
    "cable_twist": "newton_tpu.examples.example_cable_twist",
    "cloth_poker_cards": "newton_tpu.examples.example_cloth_poker_cards",
    "mpm_beam_twist": "newton_tpu.examples.example_mpm_beam_twist",
    "controller_impedance_hetero":
        "newton_tpu.examples.example_controller_impedance_hetero",
    "ik_franka": "newton_tpu.examples.example_ik_franka",
    "mujoco_xpbd_coupled":
        "newton_tpu.examples.example_mujoco_xpbd_coupled",
    "cloth_stiff_material_hanging":
        "newton_tpu.examples.example_cloth_stiff_material_hanging",
    "replay_viewer": "newton_tpu.examples.example_replay_viewer",
    "selection_multiple": "newton_tpu.examples.example_selection_multiple",
    "basic_heightfield": "newton_tpu.examples.example_basic_heightfield",
    "basic_urdf": "newton_tpu.examples.example_basic_urdf",
    "domino_spiral": "newton_tpu.examples.example_domino_spiral",
    "brick_stacking": "newton_tpu.examples.example_brick_stacking",
    "softbody_dropping_to_cloth":
        "newton_tpu.examples.example_softbody_dropping_to_cloth",
    "rigid_soft_contact":
        "newton_tpu.examples.example_rigid_soft_contact",
    "selection_materials":
        "newton_tpu.examples.example_selection_materials",
    "cloth_bending": "newton_tpu.examples.example_cloth_bending",
    "mpm_snow_ball": "newton_tpu.examples.example_mpm_snow_ball",
    "mpm_viscous": "newton_tpu.examples.example_mpm_viscous",
    "cable_dahl_hysteresis":
        "newton_tpu.examples.example_cable_dahl_hysteresis",
    "basic_shapes": "newton_tpu.examples.example_basic_shapes",
    "mpm_multi_material":
        "newton_tpu.examples.example_mpm_multi_material",
    "basic_plotting": "newton_tpu.examples.example_basic_plotting",
    "selection_articulations":
        "newton_tpu.examples.example_selection_articulations",
    "kamino_heterogeneous":
        "newton_tpu.examples.example_kamino_heterogeneous",
    "cloth_style3d": "newton_tpu.examples.example_cloth_style3d",
    "balance_bird": "newton_tpu.examples.example_balance_bird",
    "multi_solver_overlay":
        "newton_tpu.examples.example_basic_multi_solver_overlay",
    "cable_y_junction":
        "newton_tpu.examples.example_cable_y_junction",
    "robot_hand": "newton_tpu.examples.example_robot_hand",
    "tendon_finger": "newton_tpu.examples.example_tendon_finger",
    "robot_kitchen": "newton_tpu.examples.example_robot_kitchen",
    "nut_bolt_sdf": "newton_tpu.examples.example_nut_bolt_sdf",
    "gripper_soft": "newton_tpu.examples.example_gripper_soft",
    "cable_pile": "newton_tpu.examples.example_cable_pile",
}


def create_parser() -> argparse.ArgumentParser:
    """CLI matching the reference (examples/__init__.py:790-880)."""
    p = argparse.ArgumentParser(prog="newton_tpu.examples")
    p.add_argument("example", nargs="?", choices=sorted(EXAMPLES),
                   help="example to run")
    p.add_argument("--viewer", default="null",
                   choices=["null", "file", "gl", "rtx", "rerun", "viser", "usd"],
                   help="viewer backend")
    p.add_argument("--num-frames", type=int, default=100)
    p.add_argument("--device", default=None,
                   help="JAX platform override, e.g. cpu or tpu")
    p.add_argument("--num-worlds", type=int, default=4)
    p.add_argument("--output", default="recording.json",
                   help="output path for --viewer file")
    p.add_argument("--test", action="store_true",
                   help="run test_final() after the frames")
    p.add_argument("--benchmark", action="store_true",
                   help="print fps at the end")
    return p


def init(argv=None):
    """Parse args and build the viewer (reference: examples/__init__.py:867)."""
    parser = create_parser()
    args = parser.parse_args(argv)
    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)
    from ..viewer import ViewerFile, ViewerNull
    if args.viewer == "file":
        viewer = ViewerFile(args.output)
    elif args.viewer == "gl":
        from ..viewer.viewer_gl import ViewerGL
        viewer = ViewerGL()
    elif args.viewer == "rtx":
        from ..viewer.viewer_rtx import ViewerRTX
        viewer = ViewerRTX()
    elif args.viewer == "rerun":
        from ..viewer import ViewerRerun
        viewer = ViewerRerun()
    elif args.viewer == "viser":
        from ..viewer import ViewerViser
        viewer = ViewerViser()
    elif args.viewer == "usd":
        from ..viewer import ViewerUSD
        viewer = ViewerUSD(args.output if args.output != "recording.json"
                           else "recording.usda")
    else:
        viewer = ViewerNull(max_frames=args.num_frames)
    return viewer, args


def run(example, args, viewer=None):
    """Main loop (reference: examples/__init__.py:521-600)."""
    import numpy as np

    viewer = viewer or getattr(example, "viewer", None)
    frames = 0
    t0 = time.perf_counter()
    while viewer is None or viewer.is_running():
        if viewer is None or getattr(viewer, "wants_step", True):
            example.step()
        if hasattr(example, "render"):
            example.render()
        frames += 1
        if frames >= args.num_frames:
            break
    elapsed = time.perf_counter() - t0

    if args.test and hasattr(example, "test_final"):
        example.test_final()
        # NaN sweep over state (reference :587-600)
        state = getattr(example, "state", None) or getattr(example, "state_0", None)
        if state is not None:
            for name in ("body_q", "body_qd", "particle_q", "joint_q"):
                arr = np.asarray(getattr(state, name))
                assert np.isfinite(arr).all(), f"NaN/Inf in {name}"
        print("test passed")
    if args.benchmark:
        print(f"frames: {frames}  fps: {frames / max(elapsed, 1e-9):.1f}")
    if viewer is not None:
        viewer.close()


def browse(argv=None):
    """Interactive example browser (reference: examples/__init__.py:521
    browse loop): groups examples by prefix, prompts for a number or name,
    runs the pick, then returns to the list. 'q' exits."""
    names = sorted(EXAMPLES)
    groups = {}
    for n in names:
        groups.setdefault(n.split("_", 1)[0], []).append(n)
    while True:
        print("\nnewton_tpu examples\n" + "=" * 19)
        num = {}
        i = 1
        for gname in sorted(groups):
            print(f"\n[{gname}]")
            for n in groups[gname]:
                num[str(i)] = n
                print(f"  {i:3d}. {n}")
                i += 1
        try:
            pick = input("\nrun which example? (number/name, q to quit) "
                         ).strip()
        except EOFError:
            return 0
        if pick in ("q", "quit", "exit", ""):
            return 0
        name = num.get(pick, pick)
        if name not in EXAMPLES:
            print(f"unknown example {pick!r}")
            continue
        try:
            main([name] + list(argv or []))
        except KeyboardInterrupt:
            print("\n(interrupted)")
        except Exception as e:                          # noqa: BLE001
            print(f"example {name} failed: {e}")


def main(argv=None):
    parser = create_parser()
    args, _ = parser.parse_known_args(argv)
    if not args.example:
        if sys.stdin is not None and sys.stdin.isatty():
            return browse(argv)
        parser.print_help()
        return 1
    module = importlib.import_module(EXAMPLES[args.example])
    viewer, args = init(argv)
    example = module.Example(viewer, args)
    run(example, args, viewer)
    return 0
