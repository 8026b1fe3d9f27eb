"""Human matting training entry.

Parity with /root/reference/tools/train_human_matting_model.py +
tools/human_matting_scripts.py: the criterion dict dispatches per loss
family — Global*(global_pred, trimap*255-space), Local*(local_pred, alpha,
trimap), Fusion*(fused_pred, alpha), Composition(image, alpha, fg, bg,
fused_pred) — weighted by config.loss_ratio.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(description="train human matting model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def build_loss_fn(model, config):
    import jax
    import jax.numpy as jnp

    criterion = config.train_criterion
    ratios = getattr(config, "loss_ratio", {k: 1.0 for k in criterion})
    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    def loss_fn(params, variables, batch, rng):
        images = batch["image"].astype(compute_dtype)
        mutable = list(variables.keys())
        rngs = {"dropout": rng, "droppath": jax.random.fold_in(rng, 1)}
        if mutable:
            (g, l, f), new_vars = model.apply(
                {"params": params, **variables}, images, train=True,
                rngs=rngs, mutable=mutable)
            new_vars = dict(new_vars)
        else:
            g, l, f = model.apply({"params": params}, images, train=True,
                                  rngs=rngs)
            new_vars = variables

        alpha = batch["mask"]
        trimap = batch["trimap"]
        loss_dict = {}
        total = 0.0
        for name, loss_obj in criterion.items():
            if name.startswith("Global"):
                v = loss_obj(g, trimap)
            elif name.startswith("Local"):
                v = loss_obj(l, alpha, trimap)
            elif name.startswith("Composition"):
                v = loss_obj(batch["image"].astype(jnp.float32), alpha,
                             batch["fg_map"].astype(jnp.float32),
                             batch["bg_map"].astype(jnp.float32), f)
            else:  # Fusion*
                v = loss_obj(f, alpha)
            v = v * ratios.get(name, 1.0)
            loss_dict[name] = v
            total = total + v
        loss_dict["loss"] = total
        return total, (new_vars, loss_dict)

    return loss_fn


def build_eval(model, config, ctx):
    """IoU / SAD / MAE / MSE (jitted) + Grad / Conn (host) on the fused
    alpha — mirrors /root/reference/tools/human_matting_scripts.py:26-173.
    Grad/Conn run host-side per image (gaussian-derivative filters +
    connected components); set `config.eval_grad_conn = False` to skip
    them on large val sets.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.human_matting.metrics import (
        connectivity_error, gradient_error)
    from simpleaicv_pytorch_training_examples_tpu.parallel import shard_batch
    from simpleaicv_pytorch_training_examples_tpu.parallel.mesh import (
        pad_batch_to_multiple)

    with_grad_conn = getattr(config, "eval_grad_conn", True)

    compute_dtype = jnp.bfloat16 if getattr(config, "use_amp", True) \
        else jnp.float32

    @jax.jit
    def eval_step(state, batch):
        _, _, fused = model.apply(
            {"params": state.params, **state.variables},
            batch["image"].astype(compute_dtype), train=False)
        pred = fused[..., 0].astype(jnp.float32)
        alpha = batch["mask"].astype(jnp.float32)
        diff = pred - alpha
        sad = jnp.abs(diff).sum(axis=(1, 2)) / 1000.0
        mae = jnp.abs(diff).mean(axis=(1, 2))
        mse = (diff**2).mean(axis=(1, 2))
        bp = (pred > 0.5).astype(jnp.float32)
        bg = (alpha > 0.5).astype(jnp.float32)
        inter = (bp * bg).sum(axis=(1, 2))
        union = jnp.clip(bp.sum(axis=(1, 2)) + bg.sum(axis=(1, 2)) - inter,
                         1e-4, None)
        return inter / union, sad, mae, mse, pred

    def evaluate(state):
        ious, sads, maes, mses = [], [], [], []
        grads, conns = [], []
        for batch in ctx.test_loader:
            padded, n_real = pad_batch_to_multiple(batch, ctx.n_devices)
            sharded = shard_batch(padded, ctx.mesh)
            iou, sad, mae, mse, pred = eval_step(state, sharded)
            ious.extend(np.asarray(iou)[:n_real].tolist())
            sads.extend(np.asarray(sad)[:n_real].tolist())
            maes.extend(np.asarray(mae)[:n_real].tolist())
            mses.extend(np.asarray(mse)[:n_real].tolist())
            if with_grad_conn:
                pred_np = np.asarray(pred)[:n_real]
                gt_np = np.asarray(batch["mask"])[:n_real]
                for i in range(len(pred_np)):
                    grads.append(gradient_error(pred_np[i], gt_np[i]))
                    conns.append(connectivity_error(pred_np[i], gt_np[i]))
        miou = float(np.mean(ious))
        msg = (f"IoU {miou:.4f} SAD {np.mean(sads):.4f} "
               f"MAE {np.mean(maes):.4f} MSE {np.mean(mses):.6f}")
        if grads:
            msg += f" Grad {np.mean(grads):.4f} Conn {np.mean(conns):.4f}"
        return miou, msg

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
                        build_eval=build_eval)


if __name__ == "__main__":
    main()
