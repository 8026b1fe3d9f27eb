"""One-off probe: analytic fwd FLOPs for the SAM2 hiera-B+ video train
step at the production bs1 T4 1024^2 shape, via XLA HLO cost analysis of
the UNOPTIMIZED lowering (no compile needed, `lowered.cost_analysis()`).

Config choices so the count is the MODEL's fwd flops, not an artifact:
- use_flash_attention=False  (pallas custom-calls are invisible to HLO
  cost analysis; the XLA attention path exposes every matmul)
- use_gradient_checkpoint=False  (remat would double-count recompute)
- use_scan=False  (HloCostAnalysis visits a while-loop body ONCE; the
  unrolled graph counts every tracked frame)

The resulting constant is pinned in bench.py as
SAM2_BPLUS_T4_STEP_FWD_FLOPS with this file as provenance. Run on CPU:
the lowering is platform-generic at this level.

Reference shape: /root/reference/.../sam2video_train.py:591-729 (bs per
GPU x T frames condition-frame recipe).
"""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation import (
        losses)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2 import (
        sam2_hiera_base_plus_video)
    from tools.train_video_interactive_segmentation_model import (
        build_loss_fn)

    model = sam2_hiera_base_plus_video(
        image_size=1024, use_gradient_checkpoint=False, use_scan=False,
        use_high_res_features=True, use_flash_attention=False,
        memory_cond_slots=2, dtype=jnp.bfloat16)

    class cfg:
        train_criterion = losses.SAM2Loss()
        use_amp = True
        decoder_point_iters = 2

    loss_fn = build_loss_fn(model, cfg)

    b, t = 1, 4
    rs = np.random.RandomState(0)
    rq = 1024 // 4
    batch = {
        "image": jnp.asarray(rs.rand(b, t, 1024, 1024, 3), jnp.float32),
        "mask": jnp.zeros((b, t, 1024, 1024)).at[:, :, 300:700,
                                                 300:700].set(1.0),
        "prompt_point": jnp.full((b, t, 2, 3), -1.0).at[:, 0, 0].set(
            jnp.asarray([512.0, 512.0, 1.0])),
        "prompt_box": jnp.zeros((b, t, 4)),
        "prompt_box_valid": jnp.zeros((b, t)),
        "prompt_mask": jnp.zeros((b, t, rq, rq, 1)),
        "prompt_mask_valid": jnp.zeros((b, t)),
        "is_cond_frame": jnp.zeros((b, t)).at[:, 0].set(1.0),
        "is_iter_frame": jnp.zeros((b, t)).at[:, 1].set(1.0),
    }
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), batch["image"],
            {k: batch[k] for k in ("prompt_point", "prompt_box",
                                   "prompt_box_valid", "prompt_mask",
                                   "prompt_mask_valid")},
            is_cond_frame=batch["is_cond_frame"][0]))
    variables = dict(variables)
    params = variables.pop("params")

    def fwd(params, variables, batch):
        loss, _ = loss_fn(params, variables, batch, jax.random.PRNGKey(1))
        return loss

    lowered = jax.jit(fwd).lower(params, variables, batch)
    cost = lowered.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    print(f"fwd flops (bs{b} T{t}, unoptimized HLO): "
          f"{cost['flops'] / 1e12:.4f} TFLOP")
    print(f"bytes accessed: {cost.get('bytes accessed', 0) / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
