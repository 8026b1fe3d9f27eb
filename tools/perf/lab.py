"""Interactive TPU perf lab: helpers for timing train/eval step variants.

Drive from a persistent python process (tunnel warmup is ~1-3 min per
process; compiles after that are sub-second), e.g.:

    python -i tools/perf/lab.py
    >>> warmup()
    >>> sweep_train()
"""
import time
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16

def warmup():
    t0 = time.time()
    @jax.jit
    def tiny(x):
        return x * 1.000001
    float(tiny(jnp.ones((8, 8))).sum())
    print(f"warmup {time.time()-t0:.1f}s; device={jax.devices()[0].device_kind}")

def build_vit_train(softmax_dtype=jnp.float32, batch_size=256, remat=False,
                    flash=False, **model_kw):
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
                           compute_dtype=jnp.bfloat16, donate=False)
    batch = {"image": jnp.asarray(
                 np.random.RandomState(0).rand(batch_size, 224, 224, 3),
                 jnp.float32),
             "label": jnp.zeros((batch_size,), jnp.int32)}
    return model, step, state, batch

def time_chain(fn, *args, iters=10, label=""):
    """Chain `iters` calls of a (state, batch, rng)->(state, metrics) step
    inside one jit; returns ms/step."""
    @jax.jit
    def chain(state, batch, rng):
        def body(i, carry):
            s, _ = carry
            s, m = fn(s, batch, jax.random.fold_in(rng, i))
            return (s, m["loss"])
        return jax.lax.fori_loop(0, iters, body,
                                 (args[0], jnp.zeros((), jnp.float32)))
    state, batch = args[0], args[1]
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    out = chain(state, batch, rng); float(out[1])
    tc = time.time() - t0
    t0 = time.perf_counter()
    out = chain(state, batch, rng); float(out[1])
    dt = (time.perf_counter() - t0) / iters
    bs = batch["image"].shape[0]
    mfu = 3.0 * 17.58e9 * bs / dt / PEAK
    print(f"{label}: {dt*1e3:.1f} ms/step  {bs/dt:.0f} img/s  mfu={mfu:.3f}"
          f"  (compile+1st {tc:.1f}s)")
    return dt

def time_fwd(model, state, batch, iters=20, train=True, label="fwd"):
    """Forward-only chained timing."""
    imgs = batch["image"].astype(jnp.bfloat16)
    rng = jax.random.PRNGKey(1)
    @jax.jit
    def chain(params, imgs):
        def body(i, carry):
            acc, x = carry
            out = model.apply({"params": params, **state.variables}, x,
                              train=train,
                              rngs={"dropout": rng, "droppath": rng})
            acc = acc + out.astype(jnp.float32).sum()
            x = imgs * (1.0 + 1e-9 * acc.astype(imgs.dtype))
            return acc, x
        acc, _ = jax.lax.fori_loop(0, iters, body,
                                   (jnp.zeros((), jnp.float32), imgs))
        return acc
    t0 = time.time(); float(chain(state.params, imgs)); tc = time.time()-t0
    t0 = time.perf_counter(); float(chain(state.params, imgs))
    dt = (time.perf_counter() - t0) / iters
    bs = imgs.shape[0]
    mfu = 17.58e9 * bs / dt / PEAK
    print(f"{label}: {dt*1e3:.1f} ms  {bs/dt:.0f} img/s  fwd-mfu={mfu:.3f}"
          f"  (compile+1st {tc:.1f}s)")
    return dt

def time_grad(model, state, batch, iters=10, label="fwd+bwd"):
    """value_and_grad only (no optimizer) chained."""
    from simpleaicv_pytorch_training_examples_tpu.classification import losses
    crit = losses.CELoss()
    imgs = batch["image"].astype(jnp.bfloat16)
    labels = batch["label"]
    def loss_fn(params, x):
        out = model.apply({"params": params, **state.variables}, x,
                          train=True,
                          rngs={"dropout": jax.random.PRNGKey(0),
                                "droppath": jax.random.PRNGKey(1)})
        return crit(out, labels)
    gfn = jax.value_and_grad(loss_fn)
    @jax.jit
    def chain(params, imgs):
        def body(i, carry):
            acc, x = carry
            loss, grads = gfn(params, x)
            gsum = sum(g.astype(jnp.float32).sum()
                       for g in jax.tree_util.tree_leaves(grads))
            acc = acc + loss.astype(jnp.float32) + 0.0 * gsum
            x = imgs * (1.0 + 1e-9 * acc.astype(imgs.dtype))
            return acc, x
        acc, _ = jax.lax.fori_loop(0, iters, body,
                                   (jnp.zeros((), jnp.float32), imgs))
        return acc
    t0 = time.time(); float(chain(state.params, imgs)); tc = time.time()-t0
    t0 = time.perf_counter(); float(chain(state.params, imgs))
    dt = (time.perf_counter() - t0) / iters
    bs = imgs.shape[0]
    mfu = 3.0 * 17.58e9 * bs / dt / PEAK
    print(f"{label}: {dt*1e3:.1f} ms  {bs/dt:.0f} img/s  mfu={mfu:.3f}"
          f"  (compile+1st {tc:.1f}s)")
    return dt

if __name__ == "__main__":
    pass
