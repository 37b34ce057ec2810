"""State validation & test assertion helpers.

TPU-native equivalents of reference newton/tests/unittest_utils.py
(assert_np_equal :481, find_nan_members / find_nonfinite_members :500-530)
and the NaN sweeps in examples/__init__.py:587-600, plus a checkify wrapper
standing in for wp.config.verify_fp.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

__all__ = ["assert_np_equal", "find_nan_members", "find_nonfinite_members",
           "nan_sweep", "check_state_valid", "checkify_step"]


def assert_np_equal(a, b, tol: float = 0.0, msg: str = ""):
    """Array equality with optional tolerance (reference: unittest_utils:481)."""
    a = np.asarray(a)
    b = np.asarray(b)
    if tol == 0.0:
        np.testing.assert_array_equal(a, b, err_msg=msg)
    else:
        np.testing.assert_allclose(a, b, atol=tol, err_msg=msg)


def _members(obj) -> Dict[str, Any]:
    import jax
    out = {}
    leaves, _ = jax.tree_util.tree_flatten_with_path(obj)
    for path, leaf in leaves:
        if hasattr(leaf, "dtype") and np.issubdtype(np.asarray(leaf).dtype,
                                                    np.floating):
            out[jax.tree_util.keystr(path)] = leaf
    return out


def find_nan_members(obj) -> List[str]:
    """Names of float members containing NaNs (reference: unittest_utils:500)."""
    return [k for k, v in _members(obj).items()
            if np.isnan(np.asarray(v)).any()]


def find_nonfinite_members(obj) -> List[str]:
    """Names of float members containing NaN/Inf."""
    return [k for k, v in _members(obj).items()
            if not np.isfinite(np.asarray(v)).all()]


def nan_sweep(*objs, context: str = ""):
    """Raise if any pytree member is non-finite
    (reference: examples/__init__.py:587-600 post-test sweep)."""
    for obj in objs:
        bad = find_nonfinite_members(obj)
        if bad:
            raise AssertionError(
                f"non-finite members{' in ' + context if context else ''}: "
                f"{bad}")


def check_state_valid(state, max_speed: float = 1.0e4) -> Dict[str, Any]:
    """Benchmark validity gates (reference: benchmark_metrics.py:160):
    finite state, normalized quaternions, bounded speeds. Returns a report
    dict with ``valid`` plus the individual checks."""
    bq = np.asarray(state.body_q).reshape(-1, 7)
    bqd = np.asarray(state.body_qd).reshape(-1, 6)
    report = {
        "finite": bool(np.isfinite(bq).all() and np.isfinite(bqd).all()),
        "quat_normalized": bool(
            np.abs(np.linalg.norm(bq[:, 3:7], axis=-1) - 1.0).max() < 1e-2)
        if len(bq) else True,
        "speed_bounded": bool(np.abs(bqd).max() < max_speed)
        if len(bqd) else True,
    }
    report["valid"] = all(report.values())
    return report


def checkify_step(step_fn):
    """Wrap a step with jax.experimental.checkify NaN checks — the
    debugging analog of the reference's wp.config.verify_fp. Returns
    (checked_fn); call as ``err, out = checked_fn(state)`` and
    ``err.throw()`` to surface failures."""
    import jax
    from jax.experimental import checkify

    return checkify.checkify(step_fn, errors=checkify.float_checks)
