"""Tensor-parallel parameter sharding rules.

The reference is DP-only (SURVEY.md §2.2); this adds the optional `model`
mesh axis for tensor-sharding large encoders (SAM ViT-H, DINOv3-L+) per
the scaling-book recipe: annotate the big matmul weights, let XLA insert
the all-reduces over ICI.

Megatron-style layout for transformer blocks:
- column-parallel (output dim sharded): qkv / fc1 / mlp up-projections;
- row-parallel (input dim sharded): attention out-proj / fc2 — XLA emits
  one psum per pair.
Everything else (norms, biases, embeddings, conv stems) stays replicated.
"""

import re

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["transformer_tp_rules", "shard_params"]

# (path regex, PartitionSpec for the kernel)
_COLUMN = P(None, "model")   # [in, out] sharded on out
_ROW = P("model", None)      # [in, out] sharded on in

_DEFAULT_RULES = (
    (r"\.qkv\.kernel$", _COLUMN),
    (r"\.(fc1|lin1|linear1|mlp_lin1|mlp_fc1|w12)\.kernel$", _COLUMN),
    (r"\.(proj|out_proj)\.kernel$", _ROW),
    (r"\.(fc2|lin2|linear2|mlp_lin2|mlp_fc2|w3)\.kernel$", _ROW),
)


def transformer_tp_rules():
    return _DEFAULT_RULES


def shard_params(params, mesh, rules=None):
    """device_put every param with its rule's sharding (replicated
    otherwise). XLA's sharding propagation takes it from there: activations
    pick up the model axis through the matmuls and the row-parallel
    layers' outputs get psummed over ICI automatically."""
    from ..utils.optimizers import leaf_path_names

    rules = rules or _DEFAULT_RULES
    compiled = [(re.compile(p), spec) for p, spec in rules]
    names = leaf_path_names(params)
    leaves = jax.tree_util.tree_leaves(params)
    treedef = jax.tree_util.tree_structure(params)
    tp = mesh.shape.get("model", 1)

    out = []
    for name, leaf in zip(names, leaves):
        spec = P()
        for pat, s in compiled:
            if pat.search(name) and leaf.ndim == 2:
                # only shard when the dimension divides evenly
                dim = 1 if s == _COLUMN else 0
                if leaf.shape[dim] % tp == 0:
                    spec = s
                break
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)
