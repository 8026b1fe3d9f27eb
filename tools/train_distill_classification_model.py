"""Distillation training entry (KD / DML / L2 on a teacher-student pair).

Parity with /root/reference/tools/train_distill_classification_model.py +
tools/scripts.py:291-500: config provides a KDModel, a train_criterion dict
{loss_name: loss}, and loss_ratio weights; CE-family losses hit the student
(and teacher when not frozen) vs labels, pairwise losses hit (stu, tea).
When freeze_teacher the optimizer factory zeroes the teacher's lr so weight
decay cannot drift the frozen weights.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(description="train distillation model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def build_loss_fn(model, config):
    import jax
    import jax.numpy as jnp

    criterion = config.train_criterion  # dict name -> loss
    ratios = config.loss_ratio
    freeze = getattr(config, "freeze_teacher", True)
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    def loss_fn(params, variables, batch, rng):
        images = batch["image"].astype(compute_dtype)
        mutable = list(variables.keys())
        rngs = {"dropout": rng, "droppath": jax.random.fold_in(rng, 1)}
        if mutable:
            (tea_out, stu_out), new_vars = model.apply(
                {"params": params, **variables}, images, train=True,
                rngs=rngs, mutable=mutable)
            new_vars = dict(new_vars)
        else:
            tea_out, stu_out = model.apply({"params": params}, images,
                                           train=True, rngs=rngs)
            new_vars = variables

        loss_dict = {}
        total = 0.0
        for name, loss_obj in criterion.items():
            if name in ("CELoss", "OneHotLabelCELoss"):
                if not freeze:
                    v = loss_obj(tea_out, batch["label"]) * ratios[name]
                    loss_dict["tea_" + name] = v
                    total = total + v
                v = loss_obj(stu_out, batch["label"]) * ratios[name]
                loss_dict["stu_" + name] = v
                total = total + v
            else:
                v = loss_obj(stu_out, tea_out) * ratios[name]
                loss_dict[name] = v
                total = total + v
        loss_dict["loss"] = total
        return total, (new_vars, loss_dict)

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

    # freeze teacher: zero its lr so neither grads nor wd touch it
    if getattr(config, "freeze_teacher", True):
        name, params_dict = config.optimizer
        params_dict = dict(params_dict)
        sub = dict(params_dict.get("sub_layer_lr") or {})
        sub["teacher"] = 0.0
        params_dict["sub_layer_lr"] = sub
        config.optimizer = (name, params_dict)

    def build_eval(model, config, ctx):
        return classification_evaluator(model, config, ctx, output_index=1)

    return run_training(config, args.work_dir,
                        build_loss_fn=build_loss_fn,
                        build_eval=build_eval)


if __name__ == "__main__":
    main()
