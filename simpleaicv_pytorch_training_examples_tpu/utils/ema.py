"""Exponential moving average of parameters.

Parity with /root/reference/tools/utils.py:145-172 (`EmaModel`): shadow copy
with ``e = decay * e + (1 - decay) * m`` over every value. In JAX the shadow
is just a second pytree updated inside the jitted train step (no deepcopy, no
DDP re-wrap needed).
"""

import jax
import jax.numpy as jnp


def ema_init(params):
    return jax.tree.map(jnp.array, params)


def ema_update(ema_params, params, decay: float):
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                        ema_params, params)
