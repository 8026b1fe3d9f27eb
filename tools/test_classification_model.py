"""Classification eval entry point.

Parity with /root/reference/tools/test_classification_model.py:30-100:
``--work-dir`` with a ``test_config.py`` naming the model, dataset and the
checkpoint to evaluate; prints params count, per-image inference latency and
top-1/top-k accuracy.
"""

import argparse
import os
import sys
import time

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(description="test classification model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.engine import (
        TrainState, apply_pretrained, init_model,
        make_classification_eval_step)
    from simpleaicv_pytorch_training_examples_tpu.data import DataLoader
    from simpleaicv_pytorch_training_examples_tpu.parallel import (
        build_mesh, distributed_init, shard_batch)
    from simpleaicv_pytorch_training_examples_tpu.parallel.mesh import (
        pad_batch_to_multiple)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        get_logger, load_config_from_work_dir, set_seed)
    from simpleaicv_pytorch_training_examples_tpu.utils.meters import AccMeter

    distributed_init()
    config = load_config_from_work_dir(args.work_dir, "test_config")
    set_seed(config.seed)
    logger = get_logger("test", os.path.join(args.work_dir, "log"))

    mesh = build_mesh()
    n_devices = mesh.devices.size

    model = config.model
    input_size = getattr(config, "input_image_size", 224)
    h = w = input_size if isinstance(input_size, int) else input_size[0]
    params, variables = init_model(model, (2, h, w, 3),
                                   jax.random.PRNGKey(config.seed))
    params = apply_pretrained(model, params, logger)
    n_params = sum(np.prod(l.shape) for l in jax.tree.leaves(params))
    logger.info(f"model params: {n_params / 1e6:.3f} M")

    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       variables=variables, opt_state=(), ema_params=None)
    eval_step = make_classification_eval_step(
        model, compute_dtype=jnp.bfloat16)

    loader = DataLoader(config.test_dataset, config.batch_size,
                        config.test_collater, shuffle=False, drop_last=False,
                        num_workers=getattr(config, "num_workers", 8),
                        process_index=jax.process_index(),
                        process_count=jax.process_count())

    acc_meter = AccMeter()
    infer_time = 0.0
    n_images = 0
    for batch in loader:
        padded, n_real = pad_batch_to_multiple(batch, n_devices)
        padded = shard_batch(padded, mesh)
        t0 = time.time()
        top1, topk, _ = eval_step(state, padded)
        jax.block_until_ready(top1)
        infer_time += time.time() - t0
        acc_meter.update(np.asarray(top1)[:n_real].sum(),
                         np.asarray(topk)[:n_real].sum(), n_real)
        n_images += n_real

    logger.info(f"top1 {acc_meter.acc1:.3f} top5 {acc_meter.acc_topk:.3f} "
                f"images/s {n_images / max(infer_time, 1e-9):.1f}")
    return acc_meter.acc1


if __name__ == "__main__":
    main()
