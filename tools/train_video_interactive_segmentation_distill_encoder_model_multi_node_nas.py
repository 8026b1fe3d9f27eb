"""Multi-node SAM2 encoder distillation entry, shared-NAS log variant.

Parity with /root/reference/tools/
train_video_interactive_segmentation_distill_encoder_model_multi_node_nas
.py: reference delta is global-rank-0 log gating only (shared network
filesystem); our logger already gates on `jax.process_index() == 0`.
"""

from train_video_interactive_segmentation_distill_encoder_model import main

if __name__ == "__main__":
    main()
