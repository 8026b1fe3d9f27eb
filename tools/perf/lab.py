"""Interactive TPU perf lab: timing helpers for train/eval step variants.

Drive from a persistent python process (tunnel warmup is ~1-3 min per
process; compiles after that are fast). Timing is python-loop with one
host fetch at the end — per-dispatch latency on the axon tunnel is
~1.4 ms, negligible against 100+ ms steps. Avoid lax.fori_loop chains:
remote compile of chained train steps is pathologically slow (>40 min
observed).
"""
import time
import sys, os
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16
# 17.58e9 is the published MAC count for ViT-B/16@224 (timm's GMACs);
# the MXU peak in PEAK counts a MAC as 2 FLOPs — see bench.py derivation
VIT_B_FWD_FLOPS = 2.0 * 17.58e9


def warmup():
    t0 = time.time()
    @jax.jit
    def tiny(x):
        return x * 1.000001
    float(tiny(jnp.ones((8, 8))).sum())
    print(f"warmup {time.time()-t0:.1f}s; device={jax.devices()[0].device_kind}",
          flush=True)


def build_vit_train(softmax_dtype=jnp.float32, batch_size=256, remat=False,
                    donate=True, **model_kw):
    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones, losses)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        TrainState, init_model, make_train_step)
    from simpleaicv_pytorch_training_examples_tpu.utils.optimizers import (
        build_optimizer)
    model = backbones.vit_base_patch16(num_classes=1000, dtype=jnp.bfloat16,
                                       softmax_dtype=softmax_dtype,
                                       use_gradient_checkpoint=remat,
                                       **model_kw)
    params, variables = init_model(model, (2, 224, 224, 3),
                                   jax.random.PRNGKey(0))
    class cfg:
        optimizer = ("AdamW", {"lr": 1e-3, "global_weight_decay": False,
                               "weight_decay": 0.05,
                               "no_weight_decay_layer_name_list": []})
        scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": 0.0})
        epochs = 100
    tx, _ = build_optimizer(cfg, params, steps_per_epoch=100)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       variables=variables, opt_state=tx.init(params),
                       ema_params=None)
    step = make_train_step(model, losses.CELoss(), tx,
                           compute_dtype=jnp.bfloat16, donate=donate)
    batch = {"image": jnp.asarray(
                 np.random.RandomState(0).rand(batch_size, 224, 224, 3),
                 jnp.float32),
             "label": jnp.zeros((batch_size,), jnp.int32)}
    return model, step, state, batch


def time_train(step, state, batch, iters=10, label="train",
               fwd_mult=3.0):
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    state, metrics = step(state, batch, rng)
    float(metrics["loss"])
    tc = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, rng)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    bs = batch["image"].shape[0]
    mfu = fwd_mult * VIT_B_FWD_FLOPS * bs / dt / PEAK
    print(f"{label}: {dt*1e3:.1f} ms/step  {bs/dt:.0f} img/s  mfu={mfu:.3f}"
          f"  (compile+1st {tc:.1f}s)", flush=True)
    return dt, state


def time_apply(fn, args, iters=10, label="apply", flops=None):
    """fn must return something tree-like; we fetch one scalar at the end."""
    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.time(); fetch(fn(*args)); tc = time.time() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters
    msg = f"{label}: {dt*1e3:.1f} ms"
    if flops:
        msg += f"  mfu={flops/dt/PEAK:.3f}"
    print(msg + f"  (compile+1st {tc:.1f}s)", flush=True)
    return dt
