"""Universal matting training entry.

Parity with /root/reference/tools/train_universal_matting_model.py +
tools/universal_matting_scripts.py: UniversalMatting forward; single-object
round-1 recipe supervises the best query (by class prob) against the gt
alpha/trimap with the standard matting loss family (the reference's full
per-query Hungarian matting loss, matting_losses.py:20-713, lands with the
instance-matting recipe in a later round).
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(
        description="train universal matting model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def build_loss_fn(model, config):
    import jax
    import jax.numpy as jnp

    criterion = config.train_criterion
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    # instance mode (16.4 human_instance_matting): Hungarian per-query
    # alpha matching — criterion is UniversalInstanceMattingLoss
    if getattr(config, "instance_matting", False):
        def instance_loss_fn(params, variables, batch, rng):
            images = batch["image"].astype(compute_dtype)
            mutable = list(variables.keys())
            if mutable:
                preds, new_vars = model.apply(
                    {"params": params, **variables}, images, train=True,
                    mutable=mutable)
                new_vars = dict(new_vars)
            else:
                preds = model.apply({"params": params}, images, train=True)
                new_vars = variables
            loss_dict = criterion(preds, batch["gt_classes"],
                                  batch["gt_alphas"],
                                  jax.random.fold_in(rng, 99))
            total = sum(loss_dict.values())
            loss_dict = dict(loss_dict)
            loss_dict["loss"] = total
            return total, (new_vars, loss_dict)

        return instance_loss_fn

    ratios = getattr(config, "loss_ratio", {k: 1.0 for k in criterion})

    def loss_fn(params, variables, batch, rng):
        images = batch["image"].astype(compute_dtype)
        mutable = list(variables.keys())
        if mutable:
            (g, l, f, cls), new_vars = model.apply(
                {"params": params, **variables}, images, train=True,
                mutable=mutable)
            new_vars = dict(new_vars)
        else:
            g, l, f, cls = model.apply({"params": params}, images,
                                       train=True)
            new_vars = variables
        # best (foreground-class) query per image
        fg_prob = jax.nn.softmax(cls.astype(jnp.float32), axis=-1)[..., 1]
        best = jnp.argmax(fg_prob, axis=-1)
        bidx = jnp.arange(images.shape[0])
        g_b, l_b, f_b = g[bidx, best], l[bidx, best], f[bidx, best]

        alpha = batch["mask"]
        trimap = batch["trimap"]
        loss_dict = {}
        total = 0.0
        for name, loss_obj in criterion.items():
            if name.startswith("Global"):
                v = loss_obj(g_b, trimap)
            elif name.startswith("Local"):
                v = loss_obj(l_b, alpha, trimap)
            elif name.startswith("Composition"):
                v = loss_obj(images.astype(jnp.float32), alpha,
                             batch["fg_map"].astype(jnp.float32),
                             batch["bg_map"].astype(jnp.float32), f_b)
            else:
                v = loss_obj(f_b, alpha)
            v = v * ratios.get(name, 1.0)
            loss_dict[name] = v
            total = total + v
        loss_dict["loss"] = total
        return total, (new_vars, loss_dict)

    return loss_fn


def main():
    args = parse_args()
    from simpleaicv_pytorch_training_examples_tpu.engine.runner import (
        run_training)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        load_config_from_work_dir)

    config = load_config_from_work_dir(args.work_dir, "train_config")
    return run_training(config, args.work_dir,
                        build_loss_fn=build_loss_fn,
                        higher_is_better=False)


if __name__ == "__main__":
    main()
