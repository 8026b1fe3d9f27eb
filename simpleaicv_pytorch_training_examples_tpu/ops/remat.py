"""Named rematerialization policies for `nn.remat` blocks.

The reference checkpoints whole transformer blocks with
`torch.utils.checkpoint` (e.g. 13.interactive_segmentation_training
SAM encoder), which always recomputes the full forward in backward.
On TPU the memory/FLOPs trade is tunable: XLA can keep the matmul
outputs (the MXU work) resident in HBM and recompute only the cheap
elementwise tail, cutting the recompute cost of the backward pass
while still bounding activation memory.

Policies are referenced by name so model configs stay picklable /
hashable (flax module attributes must be hashable)."""

from __future__ import annotations

import jax

__all__ = ["named_remat_policy", "REMAT_POLICIES"]

REMAT_POLICIES = {
    # recompute everything (torch.utils.checkpoint semantics)
    "nothing_saveable": None,
    # keep matmul/conv outputs resident, recompute elementwise tails:
    # backward no longer re-runs the MXU work, ~4x-fwd step cost drops
    # toward 3x at a modest HBM cost
    "dots_saveable": "dots_saveable",
    "dots_with_no_batch_dims_saveable": "dots_with_no_batch_dims_saveable",
    # keep everything (remat becomes a no-op barrier)
    "everything_saveable": "everything_saveable",
}


def named_remat_policy(name):
    """Map a policy name (or None) to a `jax.checkpoint` policy callable."""
    if name is None or name == "nothing_saveable":
        return None
    if name not in REMAT_POLICIES:
        raise ValueError(
            f"unknown remat policy {name!r}; one of {sorted(REMAT_POLICIES)}")
    return getattr(jax.checkpoint_policies, REMAT_POLICIES[name])
