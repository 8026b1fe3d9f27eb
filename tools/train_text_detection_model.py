"""Text detection (DBNet) training entry.

Parity with /root/reference/tools/train_text_detection_model.py +
tools/text_scripts.py: DBNetLoss over collater-generated target masks.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(description="train text detection model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def build_loss_fn(model, config):
    import jax
    import jax.numpy as jnp

    criterion = config.train_criterion
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    def loss_fn(params, variables, batch, rng):
        images = batch["image"].astype(compute_dtype)
        mutable = list(variables.keys())
        rngs = {"dropout": rng}
        if mutable:
            preds, new_vars = model.apply({"params": params, **variables},
                                          images, train=True, rngs=rngs,
                                          mutable=mutable)
            new_vars = dict(new_vars)
        else:
            preds = model.apply({"params": params}, images, train=True,
                                rngs=rngs)
            new_vars = variables
        loss_dict = criterion(preds, batch)
        total = sum(loss_dict.values())
        loss_dict = dict(loss_dict)
        loss_dict["loss"] = total
        return total, (new_vars, loss_dict)

    return loss_fn


def build_eval(model, config, ctx):
    """DetEval precision/recall/hmean through the DBNet decoder (parity
    with /root/reference/tools/text_scripts.py:1150-1228)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.parallel import shard_batch
    from simpleaicv_pytorch_training_examples_tpu.parallel.mesh import (
        pad_batch_to_multiple)
    from simpleaicv_pytorch_training_examples_tpu.text_detection.decode import (
        DBNetDecoder)
    from simpleaicv_pytorch_training_examples_tpu.text_detection.deteval import (
        TextDetectionMetric)

    decoder = getattr(config, "decoder", None) or DBNetDecoder()
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    @jax.jit
    def forward(state, images):
        return model.apply({"params": state.params, **state.variables},
                           images.astype(compute_dtype), train=False)

    def evaluate(state):
        metric = TextDetectionMetric(
            precision_iou_threshold=getattr(
                config, "precision_iou_threshold", 0.5),
            recall_iou_threshold=getattr(
                config, "recall_iou_threshold", 0.5),
            punish_factor=getattr(config, "punish_factor", 1.0),
            match_count_threshold=getattr(
                config, "match_count_threshold", 2))
        for batch in ctx.test_loader:
            gt_polys = batch.pop("gt_polys", None)
            gt_ignores = batch.pop("gt_ignores", None)
            if gt_polys is None:
                continue
            padded, n_real = pad_batch_to_multiple(batch, ctx.n_devices)
            sharded = shard_batch(padded, ctx.mesh)
            preds = np.asarray(forward(state, sharded["image"]))
            boxes = decoder(preds, np.asarray(batch["size"]))
            for i in range(n_real):
                metric.update([b for b, _ in boxes[i]], gt_polys[i],
                              gt_ignores[i], batch["size"][i])
        r = metric.compute()
        return r["hmean"], (f"precision {r['precision']:.3f} "
                            f"recall {r['recall']:.3f} "
                            f"hmean {r['hmean']:.3f}")

    return evaluate


def main():
    args = parse_args()
    from simpleaicv_pytorch_training_examples_tpu.engine.runner import (
        run_training)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        load_config_from_work_dir)

    config = load_config_from_work_dir(args.work_dir, "train_config")
    has_eval = getattr(config, "test_dataset", None) is not None
    return run_training(config, args.work_dir,
                        build_loss_fn=build_loss_fn,
                        build_eval=build_eval if has_eval else None,
                        higher_is_better=has_eval)


if __name__ == "__main__":
    main()
