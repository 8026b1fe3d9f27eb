"""Text recognition (CTC) training entry.

Parity with /root/reference/tools/train_text_recognition_model.py +
tools/text_scripts.py: CTC loss over collater-encoded transcripts; per-epoch
greedy-decode accuracy + LCS precision/recall on the test set
(tools/text_scripts.py:82-893 metric family).
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(
        description="train text recognition model")
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
        loss = criterion(preds, batch["target"], batch["target_length"])
        return loss, (new_vars, {"loss": loss})

    return loss_fn


def build_eval(model, config, ctx):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.parallel import shard_batch
    from simpleaicv_pytorch_training_examples_tpu.parallel.mesh import (
        pad_batch_to_multiple)
    from simpleaicv_pytorch_training_examples_tpu.utils.text_metrics import (
        CategoryLCSMeter, edit_distance)
    from simpleaicv_pytorch_training_examples_tpu.text_recognition import (
        char_sets)

    converter = config.converter
    # per-category LCS PR sweep (reference text_scripts.py:512-893):
    # num/alpha/Chinese-level tables by default, overridable per config
    category_tables = getattr(config, "char_category_tables", None)
    if category_tables is None:
        category_tables = char_sets.default_category_tables()
    ignore_threshold = getattr(config, "category_ignore_threshold", 1000)
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    @jax.jit
    def forward(state, images):
        return model.apply({"params": state.params, **state.variables},
                           images.astype(compute_dtype), train=False)

    def evaluate(state):
        n, correct = 0, 0
        dist_sum = 0.0
        meter = CategoryLCSMeter(category_tables)
        for batch in ctx.test_loader:
            padded, n_real = pad_batch_to_multiple(batch, ctx.n_devices)
            sharded = shard_batch(padded, ctx.mesh)
            preds = forward(state, sharded["image"])
            texts = converter.decode_batch(np.asarray(preds)[:n_real])
            gts = []
            targets = np.asarray(batch["target"])[:n_real]
            lengths = np.asarray(batch["target_length"])[:n_real]
            for t, l in zip(targets, lengths):
                gts.append("".join(converter.index_to_char.get(int(i), "")
                                   for i in t[:l]))
            for pred, gt in zip(texts, gts):
                n += 1
                correct += int(pred == gt)
                dist_sum += edit_distance(pred, gt)
                meter.update(pred, gt)
        acc = correct / max(n, 1) * 100
        pr = meter.results(ignore_threshold=ignore_threshold)
        report = (f"acc {acc:.3f} edit_dist {dist_sum / max(n, 1):.3f} "
                  f"lcs_precision {pr['all'][0]:.3f} "
                  f"lcs_recall {pr['all'][1]:.3f}")
        for name in category_tables:
            report += (f" {name}_lcs_p {pr[name][0]:.3f}"
                       f" {name}_lcs_r {pr[name][1]:.3f}")
        return acc, report

    return evaluate


def main():
    args = parse_args()
    from simpleaicv_pytorch_training_examples_tpu.engine.runner import (
        run_training)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        load_config_from_work_dir)

    config = load_config_from_work_dir(args.work_dir, "train_config")
    return run_training(config, args.work_dir,
                        build_loss_fn=build_loss_fn,
                        build_eval=build_eval if getattr(
                            config, "test_dataset", None) is not None
                        else None)


if __name__ == "__main__":
    main()
