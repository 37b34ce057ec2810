"""Example smoke tests: every example runs headless for a few frames and
passes its own test_final (reference: newton/tests/test_examples.py — the
reference runs each example as a subprocess with --viewer null)."""

import importlib

import numpy as np
import pytest

from newton_tpu.examples import EXAMPLES
from newton_tpu.viewer import ViewerNull


class _Args:
    num_frames = 8
    num_worlds = 2
    test = True
    benchmark = False


@pytest.mark.parametrize("name", sorted(EXAMPLES))
def test_example_headless(name):
    module = importlib.import_module(EXAMPLES[name])
    viewer = ViewerNull(max_frames=_Args.num_frames)
    example = module.Example(viewer, _Args())
    frames = 30 if name in ("basic_sphere", "selection_reset") else 8
    for _ in range(frames):
        example.step()
        example.render()
    # NaN sweep (reference examples/__init__.py:587-600)
    state = getattr(example, "state", None)
    if state is not None:
        for attr in ("body_q", "body_qd", "particle_q", "joint_q"):
            arr = np.asarray(getattr(state, attr))
            assert np.isfinite(arr).all(), f"{name}: non-finite {attr}"
    if frames >= 30 and hasattr(example, "test_final"):
        example.test_final()


def test_cli_main_lists_examples(capsys):
    from newton_tpu.examples import main
    assert main([]) == 1
    out = capsys.readouterr().out
    assert "basic_pendulum" in out
