"""Detection eval entry.

Parity with /root/reference/tools/test_detection_model.py: load
test_config.py (model + decoder + trained checkpoint), run the COCO/VOC
eval protocol once, print mAP.
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(description="test detection model")
    parser.add_argument("--work-dir", type=str, required=True)
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from simpleaicv_pytorch_training_examples_tpu.data import DataLoader
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        TrainState, apply_pretrained, init_model)
    from simpleaicv_pytorch_training_examples_tpu.engine.evaluators import (
        detection_coco_evaluator, detection_voc_evaluator)
    from simpleaicv_pytorch_training_examples_tpu.engine.runner import (
        RunContext)
    from simpleaicv_pytorch_training_examples_tpu.parallel import (
        build_mesh, distributed_init)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        get_logger, load_config_from_work_dir, set_seed)

    distributed_init()
    config = load_config_from_work_dir(args.work_dir, "test_config")
    set_seed(config.seed)
    logger = get_logger("test", os.path.join(args.work_dir, "log"))

    mesh = build_mesh()
    s = config.input_image_size
    hw = (s, s) if isinstance(s, int) else tuple(s)
    params, variables = init_model(config.model, (2, hw[0], hw[1], 3),
                                   jax.random.PRNGKey(config.seed))
    params = apply_pretrained(config.model, params, logger)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       variables=variables, opt_state=(), ema_params=None)

    test_loader = DataLoader(config.test_dataset, config.batch_size,
                             config.test_collater, shuffle=False,
                             drop_last=False,
                             num_workers=getattr(config, "num_workers", 8),
                             process_index=jax.process_index(),
                             process_count=jax.process_count())
    ctx = RunContext(mesh, None, test_loader, logger, mesh.devices.size)
    evaluator = detection_voc_evaluator \
        if getattr(config, "eval_type", "COCO") == "VOC" \
        else detection_coco_evaluator
    evaluate = evaluator(config.model, config, ctx)
    metric, metric_log = evaluate(state)
    logger.info(metric_log)
    return metric


if __name__ == "__main__":
    main()
