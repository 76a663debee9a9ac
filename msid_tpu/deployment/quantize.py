"""Weight quantization for deployment artifacts.

Capability parity with the reference's ONNX INT8 dynamic quantization
(`/root/reference/src/deployment/optimize_model.py:78-126`, which stores
int8 weights and dequantizes at execution). TPU-native equivalent:
symmetric per-output-channel int8 weight-only quantization of every
matmul/conv kernel in the params pytree — 4x smaller checkpoints and
HBM-resident weights; compute stays bf16/fp32 (dequantize-at-use folds
into the surrounding XLA program).

API:
    qparams, scales = quantize_params(params)        # int8 + fp16 scales
    params_hat     = dequantize_params(qparams, scales)
    report         = quantization_report(params, params_hat)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_kernel(path, leaf) -> bool:
    """Quantize only matmul/conv kernels: ≥2-D 'kernel' leaves. Biases,
    norms, embeddings stay full precision (same policy as ORT dynamic
    quantization, which targets MatMul/Conv initializers)."""
    last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return last == "kernel" and hasattr(leaf, "ndim") and leaf.ndim >= 2


def quantize_params(params) -> Tuple[dict, dict]:
    """Symmetric per-output-channel int8 quantization.

    The output channel is the LAST axis of a flax kernel ([..., in, out] /
    [kh, kw, in, out]). Returns (qtree, scale_tree); unquantized leaves keep
    their values in qtree and get an empty-array sentinel in scale_tree
    (None would be a pytree *node* and break the paired tree_map).
    """
    flat = jax.tree_util.tree_leaves_with_path(params)

    q_leaves, s_leaves = [], []
    for path, leaf in flat:
        if _is_kernel(path, leaf):
            w = np.asarray(leaf, np.float32)
            axes = tuple(range(w.ndim - 1))
            amax = np.abs(w).max(axis=axes, keepdims=True)
            scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
            q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
            q_leaves.append(q)
            s_leaves.append(scale)
        else:
            q_leaves.append(np.asarray(leaf))
            s_leaves.append(_UNQUANTIZED)

    structure = jax.tree_util.tree_structure(params)
    return (
        jax.tree_util.tree_unflatten(structure, q_leaves),
        jax.tree_util.tree_unflatten(structure, s_leaves),
    )


_UNQUANTIZED = np.zeros((0,), np.float32)  # sentinel: leaf kept full precision


def dequantize_params(qtree, stree):
    """int8 + scales → fp32 params pytree (execution-ready)."""

    def deq(q, s):
        if s.size == 0:
            return jnp.asarray(q)
        return jnp.asarray(q, jnp.float32) * jnp.asarray(s)

    return jax.tree_util.tree_map(deq, qtree, stree)


def quantized_size_bytes(qtree) -> int:
    return sum(
        np.asarray(leaf).nbytes for leaf in jax.tree_util.tree_leaves(qtree)
    )


def quantization_report(variables, model=None, sample_input=None) -> dict:
    """Size reduction + (optional) output-error report, mirroring the
    reference's post-quantization size/verification print
    (optimize_model.py:104-126). ``variables`` is the full variables dict
    ({'params', 'batch_stats'?}); only params are quantized."""
    params = variables["params"] if "params" in variables else variables
    qtree, stree = quantize_params(params)
    params_hat = dequantize_params(qtree, stree)

    orig = sum(np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(params))
    quant = quantized_size_bytes(qtree) + quantized_size_bytes(stree)
    report = {
        "original_mb": orig / 1e6,
        "quantized_mb": quant / 1e6,
        "compression": orig / max(quant, 1),
    }

    if model is not None and sample_input is not None:
        def run(p):
            v = dict(variables) if "params" in variables else {}
            v["params"] = p
            return model.apply(v, sample_input, train=False)

        d = jnp.abs(
            run(params).astype(jnp.float32) - run(params_hat).astype(jnp.float32)
        )
        report["max_abs_err"] = float(jnp.max(d))
        report["mean_abs_err"] = float(jnp.mean(d))
    return report
