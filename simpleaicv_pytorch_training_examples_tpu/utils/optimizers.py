"""Optimizer factory with per-parameter grouping.

Capability parity with /root/reference/tools/utils.py:292-679
(`build_optimizer`): SGD / AdamW / Muon selected by the config's
``optimizer = (name, params_dict)`` tuple, with

- ``global_weight_decay=False`` zeroing weight decay on 1-D params and any
  param whose dotted path contains a name from
  ``no_weight_decay_layer_name_list``;
- ``sub_layer_weight_decay`` / ``sub_layer_lr`` prefix overrides;
- ViT layer-wise lr decay via ``lr_layer_decay`` + ``lr_layer_decay_block``
  (number of transformer blocks) + ``block_name`` (path prefix of the block
  list, e.g. ``"block_"``); stem params (position_encoding / cls_token /
  patch_embedding) get the deepest decay, head params 1.0;
- Muon auto-excluding position_encoding/cls_token/patch_embedding plus a
  user ``exclude_muon_layer_name_list``, AdamW fallback for the rest.

TPU-native design: instead of torch param groups, per-leaf ``weight_decay``
and ``lr_scale`` pytrees drive a single optax-style GradientTransformation,
so the entire update (including the schedule) lives inside one jitted SPMD
step — no host->device lr pushes.

The factory returns ``(tx, layer_weight_decay_info)`` where the second item
mirrors the reference's human-readable per-group report.
"""

import re
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .muon import muon_update

SUPPORTED_OPTIMIZERS = ("SGD", "AdamW", "Muon")

_STEM_LAYER_NAMES = ("position_encoding", "cls_token", "patch_embedding")


def leaf_path_names(params) -> list:
    """Dotted path name per leaf, in tree_flatten order."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    names = []
    for path, _leaf in flat:
        parts = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                parts.append(str(p.key))
            elif isinstance(p, jax.tree_util.SequenceKey):
                parts.append(str(p.idx))
            elif isinstance(p, jax.tree_util.GetAttrKey):
                parts.append(str(p.name))
            else:
                parts.append(str(p))
        names.append(".".join(parts))
    return names


def _names_to_tree(params, values_by_leaf):
    """Rebuild a pytree of per-leaf python scalars matching params."""
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, values_by_leaf)


def _compute_wd_and_lr(params, optimizer_parameters):
    """Per-leaf (weight_decay, lr_abs, lr_scale) following reference rules."""
    lr = optimizer_parameters["lr"]
    weight_decay = optimizer_parameters.get("weight_decay", 0.0)
    global_wd = optimizer_parameters.get("global_weight_decay", True)
    no_wd_names = optimizer_parameters.get("no_weight_decay_layer_name_list",
                                           []) or []
    sub_wd = optimizer_parameters.get("sub_layer_weight_decay", None)
    sub_lr = optimizer_parameters.get("sub_layer_lr", None)

    use_layer_decay = all(
        k in optimizer_parameters
        for k in ("lr_layer_decay", "lr_layer_decay_block", "block_name"))
    if use_layer_decay:
        layer_decay = optimizer_parameters["lr_layer_decay"]
        n_blocks = optimizer_parameters["lr_layer_decay_block"]
        if not isinstance(n_blocks, int):
            n_blocks = len(n_blocks)
        block_name = optimizer_parameters["block_name"]
        num_layers = n_blocks + 1
        # scales[i] = decay**(num_layers - i); blocks use scales[id+1],
        # stem uses scales[0], everything else 1.0
        lr_layer_scales = [
            layer_decay**(num_layers - i) for i in range(num_layers + 1)
        ]
        block_idx_re = re.compile(re.escape(block_name) + r"(\d+)")

    names = leaf_path_names(params)
    leaves = jax.tree_util.tree_leaves(params)

    wds, lrs, scales = [], [], []
    for name, leaf in zip(names, leaves):
        # --- weight decay ---
        if not global_wd and (leaf.ndim == 1 or any(n in name
                                                    for n in no_wd_names)):
            wd = 0.0
        else:
            wd = weight_decay
            if not global_wd and isinstance(sub_wd, dict):
                for prefix, v in sub_wd.items():
                    if prefix in name:
                        wd = v
                        break
        # --- absolute lr override ---
        leaf_lr = lr
        if isinstance(sub_lr, dict):
            for prefix, v in sub_lr.items():
                if prefix in name:
                    leaf_lr = v
                    break
        # --- layer-decay lr scale ---
        scale = 1.0
        if use_layer_decay:
            m = block_idx_re.search(name)
            if m is not None:
                layer_id = int(m.group(1))
                scale = lr_layer_scales[layer_id + 1]
            elif any(s in name for s in _STEM_LAYER_NAMES):
                scale = lr_layer_scales[0]
        wds.append(wd)
        lrs.append(leaf_lr)
        scales.append(scale)

    return names, wds, lrs, scales


def _group_report(names, wds, lrs, scales):
    """Mirror the reference's model_layer_weight_decay_list report."""
    groups = {}
    for n, w, l, s in zip(names, wds, lrs, scales):
        groups.setdefault((w, l, s), []).append(n)
    return [{
        "name": v,
        "weight_decay": k[0],
        "lr": k[1],
        "lr_scale": k[2]
    } for k, v in groups.items()]


class _SGDState(NamedTuple):
    step: jnp.ndarray
    momentum_buf: Any


def _sgd_tx(params, schedule, wd_tree, lrmul_tree, momentum, nesterov):
    """torch.optim.SGD semantics: coupled wd, momentum buffer, optional
    nesterov. Update sign convention: returns the *delta* to add to params."""

    def init_fn(params):
        buf = jax.tree.map(jnp.zeros_like, params)
        return _SGDState(jnp.zeros((), jnp.int32), buf)

    def update_fn(grads, state, params):
        mult = schedule(state.step)

        def upd(g, buf, p, wd, lrmul):
            g = g + wd * p
            new_buf = momentum * buf + g
            d = g + momentum * new_buf if nesterov else new_buf
            return -mult * lrmul * d, new_buf

        out = jax.tree.map(upd, grads, state.momentum_buf, params, wd_tree,
                           lrmul_tree)
        updates = jax.tree.map(lambda t: t[0], out,
                               is_leaf=lambda x: isinstance(x, tuple))
        bufs = jax.tree.map(lambda t: t[1], out,
                            is_leaf=lambda x: isinstance(x, tuple))
        return updates, _SGDState(state.step + 1, bufs)

    return optax.GradientTransformation(init_fn, update_fn)


class _AdamWState(NamedTuple):
    step: jnp.ndarray
    mu: Any
    nu: Any


def _adamw_tx(params, schedule, wd_tree, lrmul_tree, b1, b2, eps):
    """torch.optim.AdamW semantics: decoupled wd scaled by the live lr."""

    def init_fn(params):
        mu = jax.tree.map(jnp.zeros_like, params)
        nu = jax.tree.map(jnp.zeros_like, params)
        return _AdamWState(jnp.zeros((), jnp.int32), mu, nu)

    def update_fn(grads, state, params):
        step = state.step + 1
        mult = schedule(state.step)
        bc1 = 1.0 - b1**step.astype(jnp.float32)
        bc2 = 1.0 - b2**step.astype(jnp.float32)

        def upd(g, mu, nu, p, wd, lrmul):
            new_mu = b1 * mu + (1 - b1) * g
            new_nu = b2 * nu + (1 - b2) * (g * g)
            mu_hat = new_mu / bc1
            nu_hat = new_nu / bc2
            lr_t = mult * lrmul
            d = -lr_t * (mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * p)
            return d, new_mu, new_nu

        out = jax.tree.map(upd, grads, state.mu, state.nu, params, wd_tree,
                           lrmul_tree)
        pick = lambda i: jax.tree.map(lambda t: t[i], out,
                                      is_leaf=lambda x: isinstance(x, tuple))
        return pick(0), _AdamWState(step, pick(1), pick(2))

    return optax.GradientTransformation(init_fn, update_fn)


class _MuonState(NamedTuple):
    step: jnp.ndarray
    muon_buf: Any
    mu: Any
    nu: Any


def _muon_tx(params, schedule, use_muon_tree, lr, wd, momentum, nesterov,
             ns_steps, b1, b2, eps):
    """Muon for >=2-D non-excluded params, AdamW fallback otherwise.

    Mirrors /root/reference/tools/muon_optimizer.py: unified lr/wd, decoupled
    wd on both halves, Muon lr adjusted by 0.2*sqrt(max(A,B)).
    """

    def init_fn(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return _MuonState(jnp.zeros((), jnp.int32),
                          jax.tree.map(jnp.zeros_like, params), z,
                          jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params):
        step = state.step + 1
        lr_t = lr * schedule(state.step)
        bc1 = 1.0 - b1**step.astype(jnp.float32)
        bc2 = 1.0 - b2**step.astype(jnp.float32)

        def upd(g, buf, mu, nu, p, is_muon):
            if is_muon:
                ortho, new_buf = muon_update(g, buf, momentum, nesterov,
                                             ns_steps)
                d = -lr_t * (ortho + wd * p)
                return d, new_buf, mu, nu
            new_mu = b1 * mu + (1 - b1) * g
            new_nu = b2 * nu + (1 - b2) * (g * g)
            d = -lr_t * ((new_mu / bc1) / (jnp.sqrt(new_nu / bc2) + eps) +
                         wd * p)
            return d, buf, new_mu, new_nu

        out = jax.tree.map(upd, grads, state.muon_buf, state.mu, state.nu,
                           params, use_muon_tree)
        pick = lambda i: jax.tree.map(lambda t: t[i], out,
                                      is_leaf=lambda x: isinstance(x, tuple))
        return pick(0), _MuonState(step, pick(1), pick(2), pick(3))

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(config, params, steps_per_epoch: int):
    """Build the jointly-jitted optimizer+schedule for a config.

    Args:
      config: object with ``optimizer = (name, params_dict)``,
        ``scheduler = (name, params_dict)`` and ``epochs`` attributes — the
        same contract as the reference's train_config.
      params: the model's fp32 parameter pytree.
      steps_per_epoch: train iterations per epoch (for the fractional-epoch
        schedule).

    Returns:
      (tx, layer_weight_decay_info)
    """
    from .schedules import build_schedule

    optimizer_name, optimizer_parameters = config.optimizer
    assert optimizer_name in SUPPORTED_OPTIMIZERS, "Unsupported optimizer!"
    scheduler_name, scheduler_parameters = config.scheduler

    lr = optimizer_parameters["lr"]
    schedule = build_schedule(scheduler_name, scheduler_parameters,
                              config.epochs, steps_per_epoch, lr)

    names, wds, lrs, scales = _compute_wd_and_lr(params, optimizer_parameters)
    report = _group_report(names, wds, lrs, scales)

    if optimizer_name == "Muon":
        weight_decay = optimizer_parameters.get("weight_decay", 0.0)
        exclude = list(_STEM_LAYER_NAMES) + list(
            optimizer_parameters.get("exclude_muon_layer_name_list", []) or [])
        leaves = jax.tree_util.tree_leaves(params)
        use_muon = [
            l.ndim >= 2 and not any(e in n for e in exclude)
            for n, l in zip(names, leaves)
        ]
        use_muon_tree = _names_to_tree(params, use_muon)
        report = [{
            "name": [n for n, u in zip(names, use_muon) if u],
            "optimizer": "Muon", "lr": lr, "weight_decay": weight_decay,
        }, {
            "name": [n for n, u in zip(names, use_muon) if not u],
            "optimizer": "AdamW", "lr": lr, "weight_decay": weight_decay,
        }]
        tx = _muon_tx(
            params, schedule, use_muon_tree, lr, weight_decay,
            momentum=optimizer_parameters.get("momentum", 0.95),
            nesterov=optimizer_parameters.get("nesterov", True),
            ns_steps=optimizer_parameters.get("ns_steps", 5),
            b1=optimizer_parameters.get("adamw_beta1", 0.9),
            b2=optimizer_parameters.get("adamw_beta2", 0.999),
            eps=optimizer_parameters.get("adamw_eps", 1e-8))
        return tx, report

    # effective lr multiplier per leaf = (leaf_lr/lr)*layer_scale*lr
    lrmul = [l_ * s_ for l_, s_ in zip(lrs, scales)]
    wd_tree = _names_to_tree(params, wds)
    lrmul_tree = _names_to_tree(params, lrmul)

    if optimizer_name == "SGD":
        tx = _sgd_tx(params, schedule, wd_tree, lrmul_tree,
                     momentum=optimizer_parameters["momentum"],
                     nesterov=optimizer_parameters.get("nesterov", False))
    else:  # AdamW
        tx = _adamw_tx(params, schedule, wd_tree, lrmul_tree,
                       b1=optimizer_parameters.get("beta1", 0.9),
                       b2=optimizer_parameters.get("beta2", 0.999),
                       eps=optimizer_parameters.get("eps", 1e-8))
    return tx, report
