"""FLOPs / MACs / params counting.

Parity with /root/reference/tools/utils.py:119-142
(compute_macs_and_params, calflops-based): here via XLA's own
cost analysis on the lowered jitted forward — exact for the compiled
program rather than an operator-table estimate.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["compute_flops_and_params"]


def compute_flops_and_params(model, params, variables, input_shape,
                             **apply_kwargs):
    """Returns (flops, params_count) for one forward pass."""

    def forward(params, x):
        return model.apply({"params": params, **variables}, x,
                           **apply_kwargs)

    dummy = jnp.zeros(input_shape, jnp.float32)
    lowered = jax.jit(forward).lower(params, dummy)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    n_params = int(sum(np.prod(l.shape)
                       for l in jax.tree_util.tree_leaves(params)))
    return flops, n_params
