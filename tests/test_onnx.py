"""ONNX policy executor tests: protobuf decode + graph execution
(reference: controller_neural_mlp.py:114 warp-nn ONNX inference)."""

import jax
import jax.numpy as jnp
import numpy as np

from newton_tpu.controllers import OnnxModule, encode_mlp
from newton_tpu.controllers.onnx_runtime import (_enc_field, _enc_node,
                                                 _enc_tensor,
                                                 _enc_value_info,
                                                 _enc_attr_i)


def _mlp_np(layers, x, act=np.tanh, out_act=None):
    for i, (W, b) in enumerate(layers):
        x = x @ W + b
        if i < len(layers) - 1:
            x = act(x)
        elif out_act:
            x = out_act(x)
    return x


def test_mlp_roundtrip_matches_numpy():
    rng = np.random.default_rng(0)
    layers = [(rng.normal(size=(6, 16)).astype(np.float32),
               rng.normal(size=(16,)).astype(np.float32)),
              (rng.normal(size=(16, 4)).astype(np.float32),
               rng.normal(size=(4,)).astype(np.float32))]
    mod = OnnxModule(encode_mlp(layers, activation="Tanh"))
    assert mod.input_names == ["obs"]
    x = rng.normal(size=(3, 6)).astype(np.float32)
    got = np.asarray(mod(x))
    ref = _mlp_np(layers, x)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_mlp_output_activation_and_jit():
    rng = np.random.default_rng(1)
    layers = [(rng.normal(size=(4, 8)).astype(np.float32),
               np.zeros(8, np.float32)),
              (rng.normal(size=(8, 2)).astype(np.float32),
               np.zeros(2, np.float32))]
    mod = OnnxModule(encode_mlp(layers, activation="Relu",
                                output_activation="Tanh"))
    x = rng.normal(size=(5, 4)).astype(np.float32)
    got = np.asarray(jax.jit(mod)(x))
    ref = _mlp_np(layers, x, act=lambda v: np.maximum(v, 0),
                  out_act=np.tanh)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_gemm_transB_and_elementwise_ops():
    """Hand-assembled graph: Gemm(transB=1) -> Mul -> Clip via attrs on a
    Concat of two inputs (exercises multi-input graphs + attributes)."""
    rng = np.random.default_rng(2)
    W = rng.normal(size=(3, 5)).astype(np.float32)   # (out, in): transB
    b = rng.normal(size=(3,)).astype(np.float32)
    nodes = b""
    nodes += _enc_field(1, 2, _enc_node("Concat", ["x0", "x1"], ["cat"],
                                        _enc_attr_i("axis", 1)))
    nodes += _enc_field(1, 2, _enc_node("Gemm", ["cat", "W", "b"], ["g"],
                                        _enc_attr_i("transB", 1)))
    nodes += _enc_field(1, 2, _enc_node("Sigmoid", ["g"], ["y"]))
    inits = (_enc_field(5, 2, _enc_tensor("W", W))
             + _enc_field(5, 2, _enc_tensor("b", b)))
    graph = (nodes + inits
             + _enc_field(11, 2, _enc_value_info("x0"))
             + _enc_field(11, 2, _enc_value_info("x1"))
             + _enc_field(12, 2, _enc_value_info("y")))
    model = _enc_field(1, 0, 8) + _enc_field(7, 2, graph)
    mod = OnnxModule(model)
    x0 = rng.normal(size=(2, 2)).astype(np.float32)
    x1 = rng.normal(size=(2, 3)).astype(np.float32)
    got = np.asarray(mod(x0, x1))
    cat = np.concatenate([x0, x1], axis=1)
    ref = 1.0 / (1.0 + np.exp(-(cat @ W.T + b)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_unsupported_op_raises():
    nodes = _enc_field(1, 2, _enc_node("ConvTranspose", ["x"], ["y"]))
    graph = (nodes + _enc_field(11, 2, _enc_value_info("x"))
             + _enc_field(12, 2, _enc_value_info("y")))
    model = _enc_field(7, 2, graph)
    mod = OnnxModule(model)
    try:
        mod(np.zeros((1, 3), np.float32))
        assert False, "expected NotImplementedError"
    except NotImplementedError as e:
        assert "ConvTranspose" in str(e)
