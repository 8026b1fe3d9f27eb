"""Device-trace the SAM2 hiera-B+ bs1 T4 train step (the 468 ms/step
round-5 baseline) and dump an xplane for analyze_xplane.py.

Usage: python tools/perf/sam2_trace.py [--out /tmp/trace_sam2]
"""
import argparse
import glob
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/perf")

from lab import warmup  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/trace_sam2")
    args = p.parse_args()

    warmup()
    import jax
    from bench_sam2_train import bench_sam2_train  # noqa: F401

    # inline the bench build so we can wrap the timed loop in a trace
    import jax.numpy as jnp
    import numpy as np
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation import (  # noqa: E501
        losses)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2 import (  # noqa: E501
        sam2_hiera_base_plus_video)
    from tools.train_video_interactive_segmentation_model import (
        build_loss_fn)

    model = sam2_hiera_base_plus_video(
        image_size=1024, use_gradient_checkpoint=True, use_scan=True,
        use_high_res_features=True, use_flash_attention=True,
        head_dim_padding=64,
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
    variables = dict(model.init(
        jax.random.PRNGKey(0), batch["image"],
        {k: batch[k] for k in ("prompt_point", "prompt_box",
                               "prompt_box_valid", "prompt_mask",
                               "prompt_mask_valid")},
        is_cond_frame=batch["is_cond_frame"][0]))
    params = variables.pop("params")

    @jax.jit
    def step(params, variables, batch):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, variables, batch, jax.random.PRNGKey(1))
        return loss, grads

    loss, grads = step(params, variables, batch)
    float(loss)
    with jax.profiler.trace(args.out):
        for _ in range(3):
            loss, grads = step(params, variables, batch)
        float(loss)
    print("trace:", glob.glob(f"{args.out}/**/*.xplane.pb",
                              recursive=True), flush=True)


if __name__ == "__main__":
    main()
