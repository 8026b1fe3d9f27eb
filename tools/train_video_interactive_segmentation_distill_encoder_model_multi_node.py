"""Multi-node SAM2 (Hiera) encoder distillation entry.

Parity with /root/reference/tools/
train_video_interactive_segmentation_distill_encoder_model_multi_node.py:
same multi-node collapse as the SAM distill twin — JAX SPMD rendezvous via
`jax.distributed.initialize()` (JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID), launched once per host.
"""

from train_video_interactive_segmentation_distill_encoder_model import main

if __name__ == "__main__":
    main()
