"""ImageNet-21K semantic-softmax classification training entry.

Parity with /root/reference/tools/train_imagenet21k_classification_model.py:
the criterion is SemanticSoftmaxLoss over per-hierarchy logit slices; the
dataset provides the tree conversion API
(classification/datasets/imagenet21kdataset.py).
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(
        description="train imagenet21k classification model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def build_loss_fn(model, config):
    import jax
    import jax.numpy as jnp
    import numpy as np

    criterion = config.train_criterion
    dataset = config.train_dataset
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32
    # static per-level class-index tables
    level_classes = [jnp.asarray(c) for c in dataset.hierarchy_class_lists]
    label_table = jnp.asarray(dataset.semantic_label_table)

    def loss_fn(params, variables, batch, rng):
        images = batch["image"].astype(compute_dtype)
        mutable = list(variables.keys())
        rngs = {"dropout": rng, "droppath": jax.random.fold_in(rng, 1)}
        if mutable:
            out, new_vars = model.apply({"params": params, **variables},
                                        images, train=True, rngs=rngs,
                                        mutable=mutable)
            new_vars = dict(new_vars)
        else:
            out = model.apply({"params": params}, images, train=True,
                              rngs=rngs)
            new_vars = variables
        semantic_outputs = [out[:, c] for c in level_classes]
        semantic_labels = label_table[batch["label"]]
        loss = criterion(semantic_outputs, semantic_labels)
        return loss, (new_vars, {"loss": loss})

    return loss_fn


def main():
    args = parse_args()
    from simpleaicv_pytorch_training_examples_tpu.engine.evaluators import (
        classification_evaluator)
    from simpleaicv_pytorch_training_examples_tpu.engine.runner import (
        run_training)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        load_config_from_work_dir)

    config = load_config_from_work_dir(args.work_dir, "train_config")
    return run_training(config, args.work_dir,
                        build_loss_fn=build_loss_fn,
                        build_eval=classification_evaluator if getattr(
                            config, "test_dataset", None) is not None
                        else None)


if __name__ == "__main__":
    main()
