"""Multi-node SAM encoder distillation entry.

Parity with /root/reference/tools/
train_interactive_segmentation_distill_encoder_model_multi_node.py:54-70:
the reference's multi-node delta is torchrun rendezvous env plumbing +
rank-0 log gating. Under JAX SPMD this collapses to
`jax.distributed.initialize()` (driven by JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars — the torchrun
--master_addr/--nnodes/--node_rank analogues), which the shared runner
already performs; log gating on `jax.process_index() == 0` is likewise
built in. This wrapper exists for CLI parity; launch it once per host:

  JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=2 \
  JAX_PROCESS_ID=<rank> python tools/..._multi_node.py --work-dir <exp>
"""

from train_interactive_segmentation_distill_encoder_model import main

if __name__ == "__main__":
    main()
