"""Multi-node SAM encoder distillation entry, shared-NAS log variant.

Parity with /root/reference/tools/
train_interactive_segmentation_distill_encoder_model_multi_node_nas.py:
the reference's only delta vs the non-nas entry is gating log lines on
global rank 0 instead of per-node rank 0 (the work dir lives on a shared
network filesystem, so every node writing the log would interleave).
Our logger is already gated on `jax.process_index() == 0` — global rank 0
— so the nas behavior is the default; this wrapper exists for CLI parity.
"""

from train_interactive_segmentation_distill_encoder_model import main

if __name__ == "__main__":
    main()
