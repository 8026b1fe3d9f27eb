"""TPU-native computer-vision training framework.

A from-scratch JAX/XLA/pjit/Pallas re-design of the capability set of
SimpleAICV_pytorch_training_examples (reference mounted at /root/reference):
16 CV task families driven by the same work-dir python-config pattern,
with SPMD data parallelism over a `jax.sharding.Mesh` replacing torchrun+DDP,
on-device post-processing replacing host numpy, and fp32-param/bf16-compute
mixed precision replacing AMP+GradScaler.
"""

__version__ = "0.1.0"
