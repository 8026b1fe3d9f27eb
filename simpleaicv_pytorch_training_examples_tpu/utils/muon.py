"""Muon update math in pure jnp (TPU-native).

Capability parity with /root/reference/tools/muon_optimizer.py: momentum SGD
followed by Newton-Schulz orthogonalization of 2-D+ updates, with the
0.2*sqrt(max(A,B)) lr adjustment, and an AdamW fallback for 1-D/excluded
params (handled by the optimizer factory, not here).

TPU notes: the quintic NS iteration is three matmuls per step on the MXU; we
run it in bfloat16 (as the reference does) with an fp32 final cast. The loop
has a static trip count so it unrolls cleanly under jit.
"""

import jax.numpy as jnp

_NS_COEFFS = (3.4445, -4.7750, 2.0315)


def newton_schulz5(g: jnp.ndarray, steps: int = 5) -> jnp.ndarray:
    """Orthogonalize a 2-D matrix via the quintic Newton-Schulz iteration.

    Produces ~US'V^T (S' diag in [0.5, 1.5]) rather than exact UV^T, which is
    what Muon wants. Input may be any float dtype; compute runs in bf16.
    """
    assert g.ndim == 2
    a, b, c = _NS_COEFFS
    orig_dtype = g.dtype

    x = g.astype(jnp.bfloat16)
    transposed = g.shape[0] > g.shape[1]
    if transposed:
        x = x.T

    # spectral-norm bound <= 1 via frobenius normalization
    x = x / (jnp.linalg.norm(x) + 1e-7)
    for _ in range(steps):
        aa = jnp.dot(x, x.T, preferred_element_type=jnp.bfloat16)
        bb = b * aa + c * jnp.dot(aa, aa, preferred_element_type=jnp.bfloat16)
        x = a * x + jnp.dot(bb, x, preferred_element_type=jnp.bfloat16)

    if transposed:
        x = x.T
    return x.astype(orig_dtype)


def muon_update(grad: jnp.ndarray, buf: jnp.ndarray, momentum: float,
                nesterov: bool, ns_steps: int):
    """One Muon update for a single >=2-D parameter.

    Returns (orthogonalized_update, new_momentum_buffer). The update still
    needs the caller to apply `0.2*sqrt(max(A,B))`-adjusted lr and decoupled
    weight decay.
    """
    new_buf = momentum * buf + grad
    eff = grad + momentum * new_buf if nesterov else new_buf
    shape = eff.shape
    if eff.ndim > 2:
        # conv kernels [kh,kw,I,O] -> [kh*kw*I, O]; NS is transpose-covariant
        # so flattening direction does not change the result's orthogonality.
        eff2d = eff.reshape(-1, shape[-1])
    else:
        eff2d = eff
    ortho = newton_schulz5(eff2d, ns_steps)
    adjusted = 0.2 * (max(ortho.shape)**0.5)
    return (ortho * adjusted).reshape(shape), new_buf
