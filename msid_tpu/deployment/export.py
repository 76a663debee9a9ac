"""Model export via jax.export (StableHLO) — the ONNX-path replacement.

Capability parity with the reference deployment layer
(`/root/reference/src/deployment/export_onnx.py:19-337`): serialize the
inference function to a portable artifact, verify it runs, and numerically
compare the deployed artifact against the live model (the reference's
PyTorch↔ONNX comparator, export_onnx.py:172-271).

Artifact layout (a directory):
    module.stablehlo   serialized jax.export module with weights as ARGUMENTS
    params.npz         the weight pytree, '/'-joined keys

Weights are arguments, not baked constants: constants would bloat the
module by ~190 MB for the full model, prevent buffer sharing/donation at
run time, and oversize remote-compile requests (observed HTTP 413).
Dynamic batch is expressed with a symbolic batch dimension.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

MODULE_FILE = "module.stablehlo"
PARAMS_FILE = "params.npz"
QPARAMS_FILE = "params_int8.npz"  # int8 payload: <key> + <key>@scale pairs
META_FILE = "meta.json"  # {"optimized": bool, "dtype": "bfloat16"|...}


def make_inference_fn(model):
    """Pure inference fn: (variables, NHWC noisy batch) → restored batch.

    Weights are an argument by design — never close over them (see module
    docstring)."""

    def infer(variables: dict, x: jnp.ndarray) -> jnp.ndarray:
        out = model.apply(variables, x.astype(model.dtype), train=False)
        return out.astype(jnp.float32)

    return infer


def _flatten_variables(variables, prefix: str = "") -> dict:
    """Flatten a dict/list pytree to '/'-joined keys. List elements get a
    `name#i` key segment so :func:`_unflatten_variables` can rebuild the
    list (the fastpath tree nests lists: blocks, stages, res).

    Empty lists round-trip via an explicit `name#_empty` marker (e.g. a
    unet_light stage with num_residual_blocks=0 has ``res == []``). Empty
    dicts would still be silently dropped — raise instead of corrupting.
    """
    flat = {}
    if isinstance(variables, dict):
        items = list(variables.items())
    else:  # list/tuple
        items = [(f"{i}", v) for i, v in enumerate(variables)]
    for k, v in items:
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, (list, tuple)) and len(v) == 0:
            flat[f"{key}#_empty"] = np.zeros((0,), np.float32)
            continue
        if isinstance(v, dict) and len(v) == 0:
            raise ValueError(
                f"cannot serialize empty dict at {key!r} — it would "
                "not survive the flat key/value round trip"
            )
        if isinstance(v, dict):
            flat.update(_flatten_variables(v, key))
        elif isinstance(v, (list, tuple)):
            for i, item in enumerate(v):
                sub = f"{key}#{i}"
                if isinstance(item, (dict, list, tuple)):
                    flat.update(_flatten_variables(item, sub))
                else:
                    flat[sub] = np.asarray(item)
        else:
            flat[key] = np.asarray(v)
    return flat


def _listify(node):
    """Convert `name#i` sibling groups (see _flatten_variables) back to
    lists, recursively."""
    if not isinstance(node, dict):
        return node
    node = {k: _listify(v) for k, v in node.items()}
    groups: dict = {}
    for k in list(node.keys()):
        if "#" in k:
            name, idx = k.rsplit("#", 1)
            if idx == "_empty":  # explicit empty-list marker
                node.pop(k)
                node[name] = []
                continue
            groups.setdefault(name, {})[int(idx)] = node.pop(k)
    for name, items in groups.items():
        node[name] = [items[i] for i in range(len(items))]
    return node


def _unflatten_variables(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return _listify(tree)


def export_stablehlo(
    model,
    variables: dict,
    output_path: str | Path,
    input_shape: tuple = (1, 192, 192, 13),
    dynamic_batch: bool = True,
    int8_weights: bool = False,
    optimize: bool = False,
    tta: int = 1,
) -> Path:
    """Serialize the inference fn + weights to an artifact directory.

    Mirrors `export_to_onnx` (export_onnx.py:19-83): fixed spatial shape,
    optionally-symbolic batch dimension. With ``int8_weights`` the payload
    stores per-output-channel int8 kernels + scales (the reference's ORT
    dynamic INT8 quantization, optimize_model.py:78-126) — ~4x smaller;
    dequantized to fp32 at load.

    With ``optimize`` the artifact contains the fastpath graph (fused
    QKV, folded BN — deployment.fastpath; the reference exports its
    onnxslim-simplified model the same way, optimize_model.py:16-75) and
    the rewritten weight tree. NB the round-4 A/B measured plain
    `model.apply` marginally faster at small batch on v5e (see
    deployment/fastpath.py header), so this is an explicit opt-in, not
    what ``optimize="auto"`` serves; raises ``ValueError`` for model
    configs the fastpath does not support. Not combinable with
    ``int8_weights`` (the quantizer targets flax kernel names).

    ``tta`` > 1 bakes a dihedral self-ensemble into the exported module
    (`msid_tpu.ops.tta`): the artifact averages that many
    rotated/flipped views per call. Composes with both ``optimize`` and
    ``int8_weights``; recorded in meta.json so the parity comparator
    ensembles its live side to match.
    """
    import json

    from jax import export as jax_export

    if optimize and int8_weights:
        raise ValueError("optimize=True is not supported with int8_weights")

    compute_dtype = jnp.dtype(model.dtype)
    if optimize:
        from msid_tpu.deployment.fastpath import (
            make_fast_inference_fn,
            optimize_for_inference,
        )

        # Serialize fp32 weights (npz can't hold bfloat16 without pickling)
        # and record the compute dtype in meta.json; the module's avals are
        # the compute dtype, load_exported casts the payload to match.
        # matmul upsample for unet_light, conv_transpose for unet_skip —
        # same measured choice as InferenceSession's auto path.
        mm = model.decoder_arch != "unet_skip"
        host_fp32 = optimize_for_inference(
            model, variables, as_numpy=True,
            upsample="matmul" if mm else "ct",
        )
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if np.issubdtype(np.asarray(a).dtype, np.floating) else np.asarray(a),
            host_fp32,
        )
        raw_infer = make_fast_inference_fn(model, matmul_upsample=mm)
    else:
        host_fp32 = None
        raw_infer = make_inference_fn(model)
    # wrap_forward validates tta eagerly (raises for tta<1 or >8, so a
    # typo like tta=0 can't silently export single-view) and is the
    # identity at tta == 1.
    from msid_tpu.ops.tta import wrap_forward

    raw_infer = wrap_forward(raw_infer, tta, input_shape[1], input_shape[2])
    infer = jax.jit(raw_infer)
    if dynamic_batch:
        scope = jax_export.SymbolicScope()
        (b,) = jax_export.symbolic_shape("b", scope=scope)
        shape = (b, *input_shape[1:])
    else:
        shape = tuple(input_shape)

    var_shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables
    )
    exported = jax_export.export(infer)(
        var_shapes, jax.ShapeDtypeStruct(shape, jnp.float32)
    )
    blob = exported.serialize()

    out_dir = Path(output_path)
    if out_dir.suffix:  # a file-like path was given; use it as a directory
        out_dir = out_dir.with_suffix("")
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / MODULE_FILE).write_bytes(blob)
    host_vars = host_fp32 if optimize else jax.device_get(variables)
    if int8_weights:
        from msid_tpu.deployment.quantize import quantize_params

        qtree, stree = quantize_params(host_vars)
        flat_q = _flatten_variables(qtree)
        flat_s = _flatten_variables(stree)
        payload = dict(flat_q)
        for k, s in flat_s.items():
            if s.size:
                payload[k + "@scale"] = s
        np.savez(out_dir / QPARAMS_FILE, **payload)
    else:
        np.savez(out_dir / PARAMS_FILE, **_flatten_variables(host_vars))
    (out_dir / META_FILE).write_text(json.dumps({
        "optimized": bool(optimize),
        "dtype": np.dtype(compute_dtype).name,
        "tta": int(tta),
    }))

    total_mb = sum(f.stat().st_size for f in out_dir.iterdir()) / 1e6
    logger.info("Exported StableHLO artifact: %s (%.2f MB, module %.2f MB)",
                out_dir, total_mb, len(blob) / 1e6)
    return out_dir


def load_exported(path: str | Path):
    """Load an artifact directory back to a callable ``fn(x) -> y``
    (weights restored from the payload and bound)."""
    from jax import export as jax_export

    path = Path(path)
    if path.is_file():  # bare module without payload (legacy/raw)
        exported = jax_export.deserialize(path.read_bytes())
        return exported.call
    exported = jax_export.deserialize((path / MODULE_FILE).read_bytes())
    if (path / QPARAMS_FILE).exists():
        with np.load(path / QPARAMS_FILE) as z:
            flat = {k: z[k] for k in z.files}
        deq = {}
        for k, v in flat.items():
            if k.endswith("@scale"):
                continue
            scale = flat.get(k + "@scale")
            deq[k] = v.astype(np.float32) * scale if scale is not None else v
        variables = _unflatten_variables(deq)
    else:
        with np.load(path / PARAMS_FILE) as z:
            variables = _unflatten_variables({k: z[k] for k in z.files})

    meta_path = path / META_FILE
    if meta_path.exists():
        import json

        meta = json.loads(meta_path.read_text())
        if meta.get("optimized"):
            # Optimized payloads are stored fp32 (npz has no bfloat16);
            # the module's avals are the compute dtype — cast to match.
            dtype = jnp.dtype(meta["dtype"])
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                variables,
            )

    def call(x):
        return exported.call(variables, x)

    return call


def verify_exported_model(
    path: str | Path,
    input_shape: tuple = (1, 192, 192, 13),
    batch_sizes: tuple = (1, 2),
) -> bool:
    """Smoke-test the artifact: deserialize + run at several batch sizes
    (reference `verify_onnx_model`, export_onnx.py:86-169)."""
    fn = load_exported(path)
    for b in batch_sizes:
        x = np.zeros((b, *input_shape[1:]), np.float32)
        try:
            y = np.asarray(fn(x))
        except Exception as e:
            logger.error("Exported model failed at batch %d: %s", b, e)
            return False
        if y.shape != x.shape:
            logger.error("Exported model output shape %s != input %s", y.shape, x.shape)
            return False
        if not np.all(np.isfinite(y)):
            logger.error("Exported model produced non-finite output")
            return False
    logger.info("Exported model verification passed (batches %s)", list(batch_sizes))
    return True


@dataclasses.dataclass
class ComparisonResult:
    max_abs_diff: float
    mean_abs_diff: float
    cosine_similarity: float
    allclose: bool

    def __str__(self) -> str:
        return (
            f"max|Δ|={self.max_abs_diff:.3e} mean|Δ|={self.mean_abs_diff:.3e} "
            f"cos={self.cosine_similarity:.6f} allclose={self.allclose}"
        )


def compare_live_vs_exported(
    model,
    variables: dict,
    path: str | Path,
    input_shape: tuple = (1, 192, 192, 13),
    rtol: float = 1e-3,
    atol: float = 1e-5,
    seed: int = 0,
) -> ComparisonResult:
    """Numerical parity live-model vs exported artifact (reference
    `compare_pytorch_onnx_outputs`, export_onnx.py:172-271: max/mean abs
    diff, cosine similarity, allclose rtol 1e-3 / atol 1e-5)."""
    import json

    x = jax.random.uniform(
        jax.random.PRNGKey(seed), input_shape, jnp.float32, minval=-2.0, maxval=2.0
    )
    live_fn = make_inference_fn(model)
    meta_path = Path(path) / META_FILE
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    tta = int(meta.get("tta", 1))
    if tta > 1:  # artifact bakes a dihedral ensemble; match it live
        from msid_tpu.ops.tta import wrap_forward

        live_fn = wrap_forward(live_fn, tta, input_shape[1], input_shape[2])
    live = np.asarray(jax.jit(live_fn)(variables, x))
    deployed = np.asarray(load_exported(path)(x))

    diff = np.abs(live - deployed)
    lf, df = live.ravel(), deployed.ravel()
    cos = float(np.dot(lf, df) / (np.linalg.norm(lf) * np.linalg.norm(df) + 1e-12))
    result = ComparisonResult(
        max_abs_diff=float(diff.max()),
        mean_abs_diff=float(diff.mean()),
        cosine_similarity=cos,
        allclose=bool(np.allclose(live, deployed, rtol=rtol, atol=atol)),
    )
    logger.info("Live vs exported: %s", result)
    return result
