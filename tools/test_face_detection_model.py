"""Face detection eval entry: decodes faces and scores WIDERFace-style AP
when the dataset provides easy/medium/hard masks (parity with
/root/reference/tools/test_face_detection_model.py +
10.face_detection_training/widerface_evaluate/eval_widerface.py)."""

import argparse

from _test_common import run_test


def build_eval(model, config, ctx):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import os

    from simpleaicv_pytorch_training_examples_tpu.face_detection.widerface_eval import (
        evaluate_widerface, load_widerface_gt)
    from simpleaicv_pytorch_training_examples_tpu.parallel import shard_batch
    from simpleaicv_pytorch_training_examples_tpu.parallel.mesh import (
        pad_batch_to_multiple)

    decoder = config.decoder
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    # official per-difficulty gt (resave_widerface_gt.py from the 4 .mat
    # files — reference eval_widerface.py:63-78). Without it the easy/
    # medium/hard splits collapse to one identical set, so the three APs
    # are the same number; the reference protocol REQUIRES the mats.
    gt_json = getattr(config, "widerface_gt_json_path", "")
    official_gt = load_widerface_gt(gt_json) \
        if gt_json and os.path.exists(gt_json) else None
    if official_gt is None:
        ctx.logger.info(
            "widerface_gt_json_path not set/found: falling back to dataset "
            "boxes with all-faces-kept masks; easy/medium/hard APs will be "
            "IDENTICAL (not the official protocol)")
    names = list(getattr(config.test_dataset, "names", []))

    @jax.jit
    def forward(state, images):
        return model.apply({"params": state.params, **state.variables},
                           images.astype(compute_dtype), train=False)

    def evaluate(state):
        gts, dets = [], []
        cursor = 0
        for batch in ctx.test_loader:
            padded, n_real = pad_batch_to_multiple(batch, ctx.n_devices)
            sharded = shard_batch(padded, ctx.mesh)
            preds = forward(state, sharded["image"])
            scores, classes, boxes = decoder(preds)
            annots = np.asarray(batch["annots"])
            scales = np.asarray(batch["scale"])
            for i in range(n_real):
                keep = classes[i] >= 0
                dets.append((boxes[i][keep] / max(scales[i], 1e-8),
                             scores[i][keep]))
                entry = None
                if official_gt is not None and cursor + i < len(names):
                    # dataset keys are "<set_name>/<file>.jpg"; gt keys are
                    # bare stems
                    stem = os.path.splitext(
                        os.path.basename(names[cursor + i]))[0]
                    entry = official_gt.get(stem)
                if entry is not None:
                    gts.append({"boxes": entry["boxes"],
                                "easy": entry["easy"],
                                "medium": entry["medium"],
                                "hard": entry["hard"]})
                else:
                    g = annots[i][annots[i][:, 4] >= 0][:, :4] / \
                        max(scales[i], 1e-8)
                    n = len(g)
                    gts.append({"boxes": g, "easy": np.ones(n, bool),
                                "medium": np.ones(n, bool),
                                "hard": np.ones(n, bool)})
            cursor += n_real
        easy, medium, hard = evaluate_widerface(gts, dets)
        return easy, (f"easy AP {easy:.4f} medium AP {medium:.4f} "
                      f"hard AP {hard:.4f}")

    return evaluate


def main():
    parser = argparse.ArgumentParser(description="test face detection model")
    parser.add_argument("--work-dir", type=str, required=True)
    args = parser.parse_args()
    return run_test(args.work_dir, build_eval)


if __name__ == "__main__":
    main()
