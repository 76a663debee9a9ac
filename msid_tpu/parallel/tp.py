"""Tensor parallelism: Megatron-style sharding of the ViT over a 2-D mesh.

Additive capability beyond the reference (which is single-GPU). The mesh
is (data, model); parameters shard over the ``model`` axis:

  * MLP fc1 kernel [D, 4D] → split output features  P(None, 'model')
  * MLP fc2 kernel [4D, D] → split input features   P('model', None)
  * attention q/k/v kernels [D, H, hd] → split heads P(None, 'model', None)
  * attention out kernel [H, hd, D] → split heads    P('model', None, None)
  * everything else (embeddings, norms, decoder convs) replicated

GSPMD places the collectives: one all-reduce after fc2 and after the
attention out-projection per block — the classic pattern (Shoeybi et al.,
"Megatron-LM", arXiv:1909.08053; scaling-book §tensor-parallelism).

No model changes needed: we place the *arrays* with these shardings
(`shard_train_state`) and jit infers input shardings from the committed
arguments; optimizer moments (mu/nu mirror the param tree) match by path
suffix, so the whole TrainState shards consistently.
"""

from __future__ import annotations

import logging

import jax

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msid_tpu.parallel.mesh import MODEL_AXIS

logger = logging.getLogger(__name__)

# (path-suffix match, expected rank) → PartitionSpec
_RULES = (
    (("mlp", "fc1", "kernel"), 2, P(None, MODEL_AXIS)),
    (("mlp", "fc1", "bias"), 1, P(MODEL_AXIS)),
    (("mlp", "fc2", "kernel"), 2, P(MODEL_AXIS, None)),
    (("attn", "query", "kernel"), 3, P(None, MODEL_AXIS, None)),
    (("attn", "key", "kernel"), 3, P(None, MODEL_AXIS, None)),
    (("attn", "value", "kernel"), 3, P(None, MODEL_AXIS, None)),
    (("attn", "query", "bias"), 2, P(MODEL_AXIS, None)),
    (("attn", "key", "bias"), 2, P(MODEL_AXIS, None)),
    (("attn", "value", "bias"), 2, P(MODEL_AXIS, None)),
    (("attn", "out", "kernel"), 3, P(MODEL_AXIS, None, None)),
)


def _path_keys(path) -> tuple:
    return tuple(
        str(getattr(p, "key", getattr(p, "name", p))) for p in path
    )


def spec_for_path(path, leaf, model_size: int) -> P:
    """PartitionSpec for one leaf: a TP rule if the path suffix matches and
    the sharded dimension divides evenly, else fully replicated."""
    keys = _path_keys(path)
    ndim = getattr(leaf, "ndim", 0)
    for suffix, rank, spec in _RULES:
        if ndim == rank and len(keys) >= len(suffix) and keys[-len(suffix):] == suffix:
            # the sharded axis must divide by the model-parallel degree
            for dim, axis in enumerate(spec):
                if axis == MODEL_AXIS and leaf.shape[dim] % model_size != 0:
                    return P()
            return spec
    return P()


def shard_train_state(state, mesh: Mesh):
    """Place every array of a TrainState (params, opt-state moments,
    batch_stats, counters) according to the TP rules over ``mesh``.

    Works on any pytree: matching is by path suffix, so adamw's mu/nu
    (which mirror the params tree) shard like their parameters.
    """
    if MODEL_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh has no '{MODEL_AXIS}' axis: {mesh.axis_names}")
    model_size = mesh.shape[MODEL_AXIS]

    def place(path, leaf):
        spec = spec_for_path(path, leaf, model_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, state)


def describe_sharding(state, max_lines: int = 12) -> str:
    """Human-readable summary of how many arrays/bytes are model-sharded."""
    sharded, replicated, lines = 0, 0, []
    for path, leaf in jax.tree_util.tree_leaves_with_path(state):
        sh = getattr(leaf, "sharding", None)
        spec = getattr(sh, "spec", None)
        # PartitionSpec is tuple-like; entries may be None/str/tuple-of-str
        entries = [e for e in (spec or ()) if e is not None]
        flat = [x for e in entries for x in (e if isinstance(e, tuple) else (e,))]
        if MODEL_AXIS in flat:
            sharded += leaf.nbytes
            if len(lines) < max_lines:
                lines.append(f"  {jax.tree_util.keystr(path)}: {spec}")
        else:
            replicated += leaf.nbytes
    head = (f"model-sharded {sharded / 1e6:.1f} MB, "
            f"replicated {replicated / 1e6:.1f} MB")
    return "\n".join([head] + lines)
