"""ONNX graph executor on JAX/XLA — the framework's native inference engine.

The reference serves pose models through onnxruntime on the host
(reference onnx_session.py:18). TPU-first, the model graph is instead
traced into ONE jitted XLA program: convolutions land on the MXU, the whole
network fuses, and a frame batch is a single device dispatch. The op set
covers the CNN family the pose stack uses (RTMPose-class backbones + SimCC
/ heatmap heads): Conv/ConvTranspose, BatchNorm, activations, pooling,
Gemm/MatMul, shape plumbing (Reshape/Transpose/Concat/Split/Slice/...),
Resize, Softmax, reductions.

Shape-carrying subgraphs (Shape -> Gather -> Concat -> Reshape chains that
exporters emit) are CONSTANT-FOLDED at trace time: every value that depends
only on initializers and static shapes is computed with numpy, so the
traced program keeps static shapes — the precondition for XLA to tile the
convolutions onto the systolic array at all.

API mirrors onnxruntime far enough for the tracker to be engine-agnostic:
OnnxJaxSession(path).run(None, {input_name: array}) -> list of np arrays.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from caliscope_tpu.pose.onnx_proto import OnnxGraph, OnnxModel, load_model

logger = logging.getLogger(__name__)


def _is_const(x) -> bool:
    return isinstance(x, np.ndarray) or np.isscalar(x)


def _pair(v, n=2):
    v = list(v) if isinstance(v, (list, tuple)) else [v] * n
    return v


def _auto_pads(attrs, kernel, strides, in_shape):
    """Resolve pads from explicit attr or auto_pad (SAME_UPPER/LOWER)."""
    auto = attrs.get("auto_pad", "NOTSET")
    if isinstance(auto, bytes):
        auto = auto.decode()
    rank = len(kernel)
    if auto in ("NOTSET", "", "VALID"):
        pads = attrs.get("pads", [0] * (2 * rank))
        return [(int(pads[i]), int(pads[i + rank])) for i in range(rank)]
    pads = []
    for i in range(rank):
        out = -(-in_shape[i] // strides[i])  # ceil
        total = max((out - 1) * strides[i] + kernel[i] - in_shape[i], 0)
        lo = total // 2 if auto == "SAME_UPPER" else (total + 1) // 2
        pads.append((lo, total - lo))
    return pads


class _Executor:
    """Traces one ONNX graph into jnp operations over an input env."""

    def __init__(self, graph: OnnxGraph):
        self.graph = graph

    def __call__(self, feeds: dict):
        env: dict[str, object] = dict(self.graph.initializers)
        env.update(feeds)
        env[""] = None  # optional-input placeholder
        for node in self.graph.nodes:
            fn = getattr(self, f"op_{node.op_type}", None)
            if fn is None:
                raise NotImplementedError(f"ONNX op {node.op_type} is not implemented")
            args = [env[i] for i in node.inputs]
            out = fn(node.attrs, *args)
            if not isinstance(out, tuple):
                out = (out,)
            for name, val in zip(node.outputs, out):
                if name:
                    env[name] = val
        return [env[name] for name in self.graph.outputs]

    # ---- convolution / linear --------------------------------------------------
    def op_Conv(self, attrs, x, w, b=None):
        rank = w.ndim - 2
        kernel = attrs.get("kernel_shape", list(w.shape[2:]))
        strides = _pair(attrs.get("strides", [1] * rank), rank)
        dil = _pair(attrs.get("dilations", [1] * rank), rank)
        groups = int(attrs.get("group", 1))
        pads = _auto_pads(attrs, kernel, strides, x.shape[2:])
        out = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), window_strides=strides, padding=pads,
            rhs_dilation=dil, feature_group_count=groups,
            dimension_numbers=("NCHW", "OIHW", "NCHW") if rank == 2 else None,
        )
        if b is not None:
            out = out + jnp.asarray(b).reshape((1, -1) + (1,) * rank)
        return out

    def op_ConvTranspose(self, attrs, x, w, b=None):
        rank = w.ndim - 2
        kernel = attrs.get("kernel_shape", list(w.shape[2:]))
        strides = _pair(attrs.get("strides", [1] * rank), rank)
        pads = attrs.get("pads", [0] * (2 * rank))
        pads = [(int(pads[i]), int(pads[i + rank])) for i in range(rank)]
        out_pad = _pair(attrs.get("output_padding", [0] * rank), rank)
        # ONNX ConvTranspose: lhs-dilated conv with flipped kernel (IOHW)
        w = jnp.swapaxes(jnp.asarray(w), 0, 1)[..., ::-1, ::-1]
        conv_pads = [
            (kernel[i] - 1 - pads[i][0], kernel[i] - 1 - pads[i][1] + out_pad[i]) for i in range(rank)
        ]
        out = jax.lax.conv_general_dilated(
            jnp.asarray(x), w, window_strides=[1] * rank, padding=conv_pads,
            lhs_dilation=strides, dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if b is not None:
            out = out + jnp.asarray(b).reshape((1, -1) + (1,) * rank)
        return out

    def op_Gemm(self, attrs, a, b, c=None):
        alpha = attrs.get("alpha", 1.0)
        beta = attrs.get("beta", 1.0)
        if attrs.get("transA", 0):
            a = jnp.swapaxes(a, -1, -2)
        if attrs.get("transB", 0):
            b = jnp.swapaxes(b, -1, -2)
        out = alpha * (jnp.asarray(a) @ jnp.asarray(b))
        if c is not None:
            out = out + beta * jnp.asarray(c)
        return out

    def op_MatMul(self, attrs, a, b):
        return jnp.matmul(jnp.asarray(a), jnp.asarray(b))

    def op_BatchNormalization(self, attrs, x, scale, bias, mean, var):
        eps = attrs.get("epsilon", 1e-5)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        inv = 1.0 / np.sqrt(np.asarray(var) + eps)
        return jnp.asarray(x) * (np.asarray(scale) * inv).reshape(shape) + (
            np.asarray(bias) - np.asarray(mean) * np.asarray(scale) * inv
        ).reshape(shape)

    def op_LayerNormalization(self, attrs, x, scale, bias=None):
        axis = int(attrs.get("axis", -1))
        eps = attrs.get("epsilon", 1e-5)
        mean = jnp.mean(x, axis=axis, keepdims=True)
        var = jnp.var(x, axis=axis, keepdims=True)
        out = (x - mean) / jnp.sqrt(var + eps) * scale
        return out + bias if bias is not None else out

    # ---- activations -------------------------------------------------------------
    def op_Relu(self, attrs, x):
        return jnp.maximum(x, 0)

    def op_LeakyRelu(self, attrs, x):
        return jnp.where(x >= 0, x, x * attrs.get("alpha", 0.01))

    def op_Sigmoid(self, attrs, x):
        return jax.nn.sigmoid(jnp.asarray(x))

    def op_HardSigmoid(self, attrs, x):
        return jnp.clip(attrs.get("alpha", 0.2) * x + attrs.get("beta", 0.5), 0, 1)

    def op_HardSwish(self, attrs, x):
        return x * jnp.clip(x / 6.0 + 0.5, 0, 1)

    def op_Tanh(self, attrs, x):
        return jnp.tanh(x)

    def op_Erf(self, attrs, x):
        return jax.lax.erf(jnp.asarray(x))

    def op_Exp(self, attrs, x):
        return jnp.exp(x)

    def op_Softmax(self, attrs, x):
        return jax.nn.softmax(jnp.asarray(x), axis=int(attrs.get("axis", -1)))

    def op_Clip(self, attrs, x, lo=None, hi=None):
        lo = attrs.get("min", lo)
        hi = attrs.get("max", hi)
        if lo is not None:
            x = jnp.maximum(x, lo)
        if hi is not None:
            x = jnp.minimum(x, hi)
        return x

    # ---- elementwise ---------------------------------------------------------------
    def op_Add(self, attrs, a, b):
        return a + b if not (_is_const(a) and _is_const(b)) else np.asarray(a) + np.asarray(b)

    def op_Sub(self, attrs, a, b):
        return a - b if not (_is_const(a) and _is_const(b)) else np.asarray(a) - np.asarray(b)

    def op_Mul(self, attrs, a, b):
        return a * b if not (_is_const(a) and _is_const(b)) else np.asarray(a) * np.asarray(b)

    def op_Div(self, attrs, a, b):
        return a / b if not (_is_const(a) and _is_const(b)) else np.asarray(a) / np.asarray(b)

    def op_Pow(self, attrs, a, b):
        return a ** b

    def op_Sqrt(self, attrs, x):
        return jnp.sqrt(x) if not _is_const(x) else np.sqrt(x)

    def op_Neg(self, attrs, x):
        return -x

    def op_Identity(self, attrs, x):
        return x

    # ---- pooling ----------------------------------------------------------------------
    def _pool(self, attrs, x, init, op, average: bool):
        kernel = attrs["kernel_shape"]
        rank = len(kernel)
        strides = _pair(attrs.get("strides", [1] * rank), rank)
        pads = _auto_pads(attrs, kernel, strides, x.shape[2:])
        window = (1, 1) + tuple(kernel)
        strides_full = (1, 1) + tuple(strides)
        pads_full = ((0, 0), (0, 0)) + tuple(pads)
        out = jax.lax.reduce_window(jnp.asarray(x), init, op, window, strides_full, pads_full)
        if average:
            ones = jnp.ones(x.shape[2:])
            counts = jax.lax.reduce_window(
                ones, 0.0, jax.lax.add, tuple(kernel), tuple(strides), tuple(pads)
            )
            out = out / counts
        return out

    def op_MaxPool(self, attrs, x):
        return self._pool(attrs, x, -jnp.inf, jax.lax.max, average=False)

    def op_AveragePool(self, attrs, x):
        return self._pool(attrs, x, 0.0, jax.lax.add, average=True)

    @staticmethod
    def _unfuse_on_tpu(x):
        """The v5e backend in this environment miscompiles a convolution
        fused with a reduction over the minor (lane) axis — the compile
        subprocess dies or post-optimization layout checks fail. An
        optimization barrier between producer and reduce sidesteps the
        fusion; measured cost is one extra HBM round trip of the operand."""
        if jax.default_backend() == "tpu" and not _is_const(x):
            return jax.lax.optimization_barrier(jnp.asarray(x))
        return x

    def op_GlobalAveragePool(self, attrs, x):
        x = self._unfuse_on_tpu(x)
        return jnp.mean(jnp.asarray(x), axis=tuple(range(2, x.ndim)), keepdims=True)

    def op_ReduceMean(self, attrs, x, axes=None):
        axes = attrs.get("axes", axes)
        axes = tuple(int(a) for a in np.ravel(axes)) if axes is not None else None
        x = self._unfuse_on_tpu(x)
        return jnp.mean(jnp.asarray(x), axis=axes, keepdims=bool(attrs.get("keepdims", 1)))

    def op_ReduceMax(self, attrs, x, axes=None):
        axes = attrs.get("axes", axes)
        axes = tuple(int(a) for a in np.ravel(axes)) if axes is not None else None
        x = self._unfuse_on_tpu(x)
        return jnp.max(jnp.asarray(x), axis=axes, keepdims=bool(attrs.get("keepdims", 1)))

    # ---- shape plumbing (constant-folded where possible) ---------------------------------
    def op_Shape(self, attrs, x):
        return np.asarray(x.shape, np.int64)

    def op_Cast(self, attrs, x):
        from caliscope_tpu.pose.onnx_proto import _NP_OF_DT

        np_dtype = _NP_OF_DT[int(attrs["to"])]
        return np.asarray(x).astype(np_dtype) if _is_const(x) else x.astype(np_dtype)

    def op_Constant(self, attrs):
        if "value" in attrs:
            return np.asarray(attrs["value"])
        for k in ("value_float", "value_int"):
            if k in attrs:
                return np.asarray(attrs[k])
        if "value_floats" in attrs:
            return np.asarray(attrs["value_floats"], np.float32)
        if "value_ints" in attrs:
            return np.asarray(attrs["value_ints"], np.int64)
        raise ValueError("Constant node without value")

    def op_ConstantOfShape(self, attrs, shape):
        value = attrs.get("value", np.zeros(1, np.float32))
        return np.full(tuple(int(s) for s in np.ravel(shape)), np.ravel(value)[0], np.asarray(value).dtype)

    def op_Reshape(self, attrs, x, shape):
        target = [int(s) for s in np.ravel(np.asarray(shape))]
        cur = list(x.shape)
        target = [cur[i] if s == 0 else s for i, s in enumerate(target)]
        return jnp.reshape(x, target) if not _is_const(x) else np.reshape(x, target)

    def op_Flatten(self, attrs, x):
        axis = int(attrs.get("axis", 1))
        lead = int(np.prod(x.shape[:axis])) if axis else 1
        return jnp.reshape(x, (lead, -1))

    def op_Transpose(self, attrs, x):
        perm = attrs.get("perm", list(range(x.ndim))[::-1])
        return jnp.transpose(x, [int(p) for p in perm])

    def op_Concat(self, attrs, *xs):
        axis = int(attrs.get("axis", 0))
        if all(_is_const(x) for x in xs):
            return np.concatenate([np.atleast_1d(np.asarray(x)) for x in xs], axis=axis)
        return jnp.concatenate([jnp.asarray(x) for x in xs], axis=axis)

    def op_Split(self, attrs, x, split=None):
        axis = int(attrs.get("axis", 0))
        split = attrs.get("split", split)
        n_out = attrs.get("num_outputs")
        if split is None:
            n = int(n_out) if n_out else 2
            sizes = [x.shape[axis] // n] * n
        else:
            sizes = [int(s) for s in np.ravel(split)]
        idx = np.cumsum(sizes)[:-1]
        return tuple(jnp.split(jnp.asarray(x), idx, axis=axis))

    def op_Slice(self, attrs, x, starts=None, ends=None, axes=None, steps=None):
        starts = attrs.get("starts", starts)
        ends = attrs.get("ends", ends)
        axes = attrs.get("axes", axes)
        starts = [int(v) for v in np.ravel(starts)]
        ends = [int(v) for v in np.ravel(ends)]
        axes = [int(v) for v in np.ravel(axes)] if axes is not None else list(range(len(starts)))
        steps = [int(v) for v in np.ravel(steps)] if steps is not None else [1] * len(starts)
        slicer = [slice(None)] * x.ndim
        for s, e, a, st in zip(starts, ends, axes, steps):
            slicer[a] = slice(s, None if e >= 2**31 else e, st)
        return x[tuple(slicer)]

    def op_Gather(self, attrs, x, idx):
        axis = int(attrs.get("axis", 0))
        if _is_const(x) and _is_const(idx):
            return np.take(np.asarray(x), np.asarray(idx).astype(np.int64), axis=axis)
        return jnp.take(jnp.asarray(x), jnp.asarray(idx).astype(jnp.int32), axis=axis)

    def op_Squeeze(self, attrs, x, axes=None):
        axes = attrs.get("axes", axes)
        if axes is None:
            return jnp.squeeze(x)
        axes = tuple(int(a) for a in np.ravel(axes))
        return np.squeeze(np.asarray(x), axis=axes) if _is_const(x) else jnp.squeeze(x, axis=axes)

    def op_Unsqueeze(self, attrs, x, axes=None):
        axes = attrs.get("axes", axes)
        for a in sorted(int(a) for a in np.ravel(axes)):
            x = np.expand_dims(x, a) if _is_const(x) else jnp.expand_dims(x, a)
        return x

    def op_Expand(self, attrs, x, shape):
        target = tuple(int(s) for s in np.ravel(shape))
        target = tuple(max(t, s) for t, s in zip(target, (1,) * (len(target) - x.ndim) + x.shape))
        return jnp.broadcast_to(x, target)

    def op_Pad(self, attrs, x, pads=None, value=None):
        pads = attrs.get("pads", pads)
        pads = [int(p) for p in np.ravel(pads)]
        rank = x.ndim
        cfg = [(pads[i], pads[i + rank]) for i in range(rank)]
        cval = float(np.ravel(value)[0]) if value is not None else 0.0
        return jnp.pad(x, cfg, constant_values=cval)

    def op_Resize(self, attrs, x, roi=None, scales=None, sizes=None):
        mode = attrs.get("mode", "nearest")
        if isinstance(mode, bytes):
            mode = mode.decode()
        if sizes is not None and np.size(sizes):
            out_hw = tuple(int(s) for s in np.ravel(sizes))[2:]
        else:
            sc = np.ravel(scales)
            out_hw = tuple(int(round(x.shape[2 + i] * sc[2 + i])) for i in range(x.ndim - 2))
        method = {"nearest": "nearest", "linear": "bilinear", "cubic": "bicubic"}[mode]
        return jax.image.resize(jnp.asarray(x), x.shape[:2] + out_hw, method=method)


class OnnxJaxSession:
    """onnxruntime-shaped facade over the jitted executor.

    The traced program is compiled per input-shape signature and cached;
    feeding a fixed batch size re-uses one XLA executable per session.
    """

    def __init__(self, model_or_path):
        model = model_or_path if isinstance(model_or_path, OnnxModel) else load_model(model_or_path)
        self.model = model
        self.graph = model.graph
        self._executor = _Executor(self.graph)
        self._jitted = {}

    # ORT-compatible surface -------------------------------------------------------
    def get_inputs(self):
        class _IO:
            def __init__(self, name, shape):
                self.name = name
                self.shape = list(shape)

        return [_IO(n, self.graph.input_shapes.get(n, ())) for n in self.graph.inputs]

    def get_outputs(self):
        class _IO:
            def __init__(self, name):
                self.name = name

        return [_IO(n) for n in self.graph.outputs]

    def run(self, output_names, feeds: dict):
        key = tuple(sorted((k, np.asarray(v).shape, str(np.asarray(v).dtype)) for k, v in feeds.items()))
        fn = self._jitted.get(key)
        if fn is None:
            names = sorted(feeds)

            @partial(jax.jit)
            def fn(*arrays):
                return self._executor(dict(zip(names, arrays)))

            self._jitted[key] = fn
        outs = fn(*[jnp.asarray(feeds[k]) for k in sorted(feeds)])
        outs = [np.asarray(o) for o in outs]
        if output_names:
            index = {n: i for i, n in enumerate(self.graph.outputs)}
            outs = [outs[index[n]] for n in output_names]
        return outs
