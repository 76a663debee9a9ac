"""Model export via jax.export (StableHLO) — the ONNX-path replacement.

Capability parity with the reference deployment layer
(`/root/reference/src/deployment/export_onnx.py:19-337`): serialize the
inference function to a portable artifact, verify it runs, and numerically
compare the deployed artifact against the live model (the reference's
PyTorch↔ONNX comparator, export_onnx.py:172-271). On TPU the portable
format is StableHLO bytes from `jax.export`; dynamic batch is expressed
with a symbolic batch dimension.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def make_inference_fn(model, variables: dict):
    """Pure inference closure: NHWC noisy batch → restored batch."""
    def infer(x: jnp.ndarray) -> jnp.ndarray:
        out = model.apply(variables, x.astype(model.dtype), train=False)
        return out.astype(jnp.float32)

    return infer


def export_stablehlo(
    model,
    variables: dict,
    output_path: str | Path,
    input_shape: tuple = (1, 192, 192, 13),
    dynamic_batch: bool = True,
) -> Path:
    """Serialize the jitted inference fn to a StableHLO artifact on disk.

    Mirrors `export_to_onnx` (export_onnx.py:19-83): fixed spatial shape,
    optionally-symbolic batch dimension.
    """
    from jax import export as jax_export

    infer = jax.jit(make_inference_fn(model, variables))
    if dynamic_batch:
        scope = jax_export.SymbolicScope()
        (b,) = jax_export.symbolic_shape("b", scope=scope)
        shape = (b, *input_shape[1:])
    else:
        shape = tuple(input_shape)
    exported = jax_export.export(infer)(
        jax.ShapeDtypeStruct(shape, jnp.float32)
    )
    blob = exported.serialize()

    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    output_path.write_bytes(blob)
    logger.info("Exported StableHLO artifact: %s (%.2f MB)", output_path,
                len(blob) / 1e6)
    return output_path


def load_exported(path: str | Path):
    """Deserialize a StableHLO artifact back to a callable."""
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())
    return exported.call


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
    x = jax.random.uniform(
        jax.random.PRNGKey(seed), input_shape, jnp.float32, minval=-2.0, maxval=2.0
    )
    live = np.asarray(jax.jit(make_inference_fn(model, variables))(x))
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
