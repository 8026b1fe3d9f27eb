"""Shared bootstrap for test_*_model.py entries: load test_config, init +
restore params, build loader, run the given evaluator once.

Parity with the reference's 17 near-identical test entries
(/root/reference/tools/test_classification_model.py:30-100 et al).
"""

import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def run_test(work_dir, build_eval, init_fn=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.data import DataLoader
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        TrainState, apply_pretrained, init_model)
    from simpleaicv_pytorch_training_examples_tpu.engine.runner import (
        RunContext)
    from simpleaicv_pytorch_training_examples_tpu.parallel import (
        build_mesh, distributed_init)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        get_logger, load_config_from_work_dir, set_seed)
    from simpleaicv_pytorch_training_examples_tpu.utils.flops import (
        compute_flops_and_params)

    distributed_init()
    config = load_config_from_work_dir(work_dir, "test_config")
    set_seed(config.seed)
    logger = get_logger("test", os.path.join(work_dir, "log"))

    mesh = build_mesh()
    model = config.model
    if init_fn is not None:
        params, variables = init_fn(model, config,
                                    jax.random.PRNGKey(config.seed))
    else:
        s = getattr(config, "input_image_size", 224)
        hw = (s, s) if isinstance(s, int) else tuple(s)
        params, variables = init_model(model, (2, hw[0], hw[1], 3),
                                       jax.random.PRNGKey(config.seed))
    params = apply_pretrained(model, params, logger)
    n_params = sum(np.prod(l.shape) for l in jax.tree.leaves(params))
    logger.info(f"model params: {n_params / 1e6:.3f} M")

    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       variables=variables, opt_state=(), ema_params=None)
    test_loader = DataLoader(
        config.test_dataset, config.batch_size, config.test_collater,
        shuffle=False, drop_last=False,
        num_workers=getattr(config, "num_workers", 8),
        process_index=jax.process_index(),
        process_count=jax.process_count())
    ctx = RunContext(mesh, None, test_loader, logger, mesh.devices.size)
    evaluate = build_eval(model, config, ctx)
    metric, metric_log = evaluate(state)
    logger.info(metric_log)
    return metric
