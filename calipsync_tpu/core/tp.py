"""Tensor-parallel sharding for the HuBERT encoder (Megatron-style).

HuBERT-large (315M params) is the biggest model in the system — the
reference runs it whole on one GPU (/root/reference/utils/hubert_extractor.py:5-11).
On a TPU slice the transformer shards naturally over a named ``model``
mesh axis:

  - q/k/v projections split on the HEAD axis (column parallel),
  - out_proj splits on the same head axis (row parallel),
  - the MLP splits intermediate-dim column-then-row.

Nothing in the model code changes: the specs below are applied to the
parameter pytree with ``jax.device_put(NamedSharding(...))`` and XLA's
GSPMD propagation inserts the two all-reduces per layer (after out_proj
and output_dense) over ICI — exactly the Megatron schedule, derived by
the compiler from the weight shardings alone. Activations stay
replicated over ``model`` (batch may shard over a ``data`` axis of the
same mesh independently).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def hubert_tp_specs(variables: dict, axis: str = "model") -> dict:
    """PartitionSpec pytree for HuBERT variables (nn/hubert.py layout).

    Shards every encoder layer's attention on the head axis and MLP on
    the intermediate axis; the conv frontend, norms, positional conv and
    projection stay replicated (they are <2% of the parameters).
    """

    def spec(path, leaf) -> P:
        keys = [getattr(k, "key", None) for k in path]
        if "attention" in keys:
            name = keys[keys.index("attention") + 1]
            leafname = keys[-1]
            if name in ("q_proj", "k_proj", "v_proj"):
                if leafname == "kernel":     # (hidden, heads, head_dim)
                    return P(None, axis, None)
                return P(axis, None)         # bias (heads, head_dim)
            if name == "out_proj":
                if leafname == "kernel":     # (heads, head_dim, hidden)
                    return P(axis, None, None)
                return P()                   # bias (hidden,)
        if "feed_forward" in keys:
            name = keys[keys.index("feed_forward") + 1]
            leafname = keys[-1]
            if name == "intermediate_dense":
                if leafname == "kernel":     # (hidden, intermediate)
                    return P(None, axis)
                return P(axis)               # bias (intermediate,)
            if name == "output_dense":
                if leafname == "kernel":     # (intermediate, hidden)
                    return P(axis, None)
                return P()
        return P()

    return jax.tree_util.tree_map_with_path(spec, variables)


def shard_hubert_variables(variables: dict, mesh: Mesh,
                           axis: str = "model",
                           config=None) -> dict:
    """Place HuBERT variables on ``mesh`` with tensor-parallel shardings.

    Args:
      variables: flax variables from :func:`nn.hubert.import_hubert` or
        ``HubertModel.init``.
      mesh: mesh containing the ``axis`` axis (other axes are ignored —
        TP params are replicated over them).
      config: optional HubertConfig for divisibility validation.
    """
    tp = mesh.shape[axis]
    if config is not None:
        if config.num_attention_heads % tp:
            raise ValueError(
                f"num_attention_heads={config.num_attention_heads} not "
                f"divisible by {axis}={tp}")
        if config.intermediate_size % tp:
            raise ValueError(
                f"intermediate_size={config.intermediate_size} not "
                f"divisible by {axis}={tp}")
    specs = hubert_tp_specs(variables, axis)
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        variables, specs)
