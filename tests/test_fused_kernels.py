"""Short-sequence fused attention + fused LayerNorm pallas kernels.

CPU runs the XLA fallbacks (API contract + gradients); the real kernel
logic is additionally exercised in pallas interpret mode at tiny shapes.
On-chip numbers live in the kernel docstrings (ViT-B/16 train shape:
attention fwd 2.3x XLA, fwd+bwd 1.9x)."""

import numpy as np


def _ref_attn(q, k, v):
    import jax
    import jax.numpy as jnp
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (d**-0.5)
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def test_fused_attention_fallback_and_grad():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.ops.pallas import (
        fused_attention)

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(2, 4, 37, 32), jnp.float32)
    k = jnp.asarray(rs.randn(2, 4, 37, 32), jnp.float32)
    v = jnp.asarray(rs.randn(2, 4, 37, 32), jnp.float32)
    np.testing.assert_allclose(np.asarray(fused_attention(q, k, v)),
                               np.asarray(_ref_attn(q, k, v)), atol=1e-6)
    g = jax.grad(lambda q: fused_attention(q, k, v).sum())(q)
    assert np.isfinite(float(jnp.abs(g).sum()))


def test_fused_attention_interpret_exact():
    """Kernel fwd + custom-vjp bwd vs autodiff of the reference, ragged N
    (non-multiple-of-8 rows exercise Mosaic's in-VMEM masking)."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.ops.pallas import (
        fused_attention)

    rs = np.random.RandomState(1)
    b, h, n, d = 2, 4, 37, 32
    q = jnp.asarray(rs.randn(b, h, n, d), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, n, d), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, n, d), jnp.float32)

    out = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_ref_attn(q, k, v)),
                               atol=1e-5)

    def loss_kernel(q, k, v):
        o = fused_attention(q, k, v, interpret=True)
        return jnp.sum(o * o)

    def loss_ref(q, k, v):
        o = _ref_attn(q, k, v)
        return jnp.sum(o * o)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5)


def test_fused_attention_key_padding_mask():
    """n_real masks trailing keys exactly like a -inf logit bias."""
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.ops.pallas import (
        fused_attention)

    rs = np.random.RandomState(2)
    b, h, n, d = 1, 2, 24, 16
    n_real = 17
    q = jnp.asarray(rs.randn(b, h, n, d), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, n, d), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, n, d), jnp.float32)
    got = fused_attention(q, k, v, n_real=n_real, interpret=True)
    want = _ref_attn(q[:, :, :, :], k[:, :, :n_real], v[:, :, :n_real])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_fused_attention_in_vit_block():
    """The flag routes through MultiHeadSelfAttention; CPU fallback keeps
    numerics identical to the plain path."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.models.common import (
        MultiHeadSelfAttention)

    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 9, 32), jnp.float32)
    m_plain = MultiHeadSelfAttention(head_nums=4)
    m_fused = MultiHeadSelfAttention(head_nums=4, use_fused_attention=True)
    params = m_plain.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(m_fused.apply(params, x)),
        np.asarray(m_plain.apply(params, x)), atol=1e-6)


def _ref_ln(x, gamma, beta, eps=1e-6):
    import jax
    import jax.numpy as jnp
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * gamma + beta).astype(x.dtype)


def test_layer_norm_fallback_matches_flax():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from simpleaicv_pytorch_training_examples_tpu.ops.pallas import (
        layer_norm)

    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(3, 7, 64), jnp.float32)
    gamma = jnp.asarray(rs.rand(64), jnp.float32)
    beta = jnp.asarray(rs.randn(64), jnp.float32)
    ln = nn.LayerNorm(epsilon=1e-6)
    want = ln.apply({"params": {"scale": gamma, "bias": beta}}, x)
    np.testing.assert_allclose(np.asarray(layer_norm(x, gamma, beta)),
                               np.asarray(want), atol=1e-5)


def test_layer_norm_interpret_fwd_bwd():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.ops.pallas import (
        layer_norm)

    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(48, 128), jnp.float32)
    gamma = jnp.asarray(rs.rand(128), jnp.float32)
    beta = jnp.asarray(rs.randn(128), jnp.float32)

    got = layer_norm(x, gamma, beta, block_tokens=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_ref_ln(x, gamma, beta)),
                               atol=1e-5)

    def loss_k(x, g, b):
        y = layer_norm(x, g, b, block_tokens=16, interpret=True)
        return jnp.sum(y * y)

    def loss_r(x, g, b):
        y = _ref_ln(x, g, b)
        return jnp.sum(y * y)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_layer_norm_interpret_ragged_tail():
    """Token count not a multiple of block_tokens pads then crops."""
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.ops.pallas import (
        layer_norm)

    rs = np.random.RandomState(6)
    x = jnp.asarray(rs.randn(2, 19, 64), jnp.float32)  # 38 tokens, bt=16
    gamma = jnp.asarray(rs.rand(64), jnp.float32)
    beta = jnp.asarray(rs.randn(64), jnp.float32)
    got = layer_norm(x, gamma, beta, block_tokens=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_ref_ln(x, gamma, beta)),
                               atol=1e-5)


def test_fused_attention_packed_interpret_exact():
    """Packed [B,N,3,H,D] variant: fwd + packed-dqkv bwd vs autodiff of
    the reference (zero-layout-copy path used by MultiHeadSelfAttention)."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.ops.pallas.fused_attention import (
        fused_attention_qkv)

    rs = np.random.RandomState(7)
    b, n, h, d = 2, 37, 4, 32
    qkv = jnp.asarray(rs.randn(b, n, 3, h, d), jnp.float32)

    def unpack_ref(qkv):
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        return _ref_attn(q, k, v).transpose(0, 2, 1, 3)

    out = fused_attention_qkv(qkv, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(unpack_ref(qkv)), atol=1e-5)

    gk = jax.grad(lambda t: jnp.sum(
        fused_attention_qkv(t, interpret=True) ** 2))(qkv)
    gr = jax.grad(lambda t: jnp.sum(unpack_ref(t) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=3e-5)


def test_fused_attention_packed_head_groups():
    """h not divisible by block_heads falls back to a divisor group."""
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.ops.pallas.fused_attention import (
        fused_attention_qkv)

    rs = np.random.RandomState(8)
    qkv = jnp.asarray(rs.randn(1, 16, 3, 6, 16), jnp.float32)  # h=6

    def unpack_ref(qkv):
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        return _ref_attn(q, k, v).transpose(0, 2, 1, 3)

    out = fused_attention_qkv(qkv, block_heads=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(unpack_ref(qkv)), atol=1e-5)


def test_fused_attention_dense_interpret_exact():
    """Lane-aligned [B,N,3C] variant (head PAIRS per 128-lane tile at
    d=64): fwd + packed bwd vs autodiff of the reference."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.ops.pallas.fused_attention import (
        fused_attention_dense)

    rs = np.random.RandomState(9)
    b, n, h, d = 2, 21, 4, 64      # ragged n, 2 head-pairs
    c = h * d
    qkv = jnp.asarray(rs.randn(b, n, 3 * c), jnp.float32)

    def ref(qkv):
        qkv5 = qkv.reshape(b, n, 3, h, d)
        q, k, v = (qkv5[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        return _ref_attn(q, k, v).transpose(0, 2, 1, 3).reshape(b, n, c)

    out = fused_attention_dense(qkv, h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(qkv)),
                               atol=1e-5)

    gk = jax.grad(lambda t: jnp.sum(
        fused_attention_dense(t, h, interpret=True) ** 2))(qkv)
    gr = jax.grad(lambda t: jnp.sum(ref(t) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=5e-5)


def test_fused_attention_dense_d128_and_padmask():
    """hpt=1 (d=128) path + n_real trailing-key masking."""
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.ops.pallas.fused_attention import (
        fused_attention_dense)

    rs = np.random.RandomState(10)
    b, n, h, d = 1, 16, 2, 128
    c = h * d
    n_real = 11
    qkv = jnp.asarray(rs.randn(b, n, 3 * c), jnp.float32)

    def ref(qkv, n_keys):
        qkv5 = qkv.reshape(b, n, 3, h, d)
        q = qkv5[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv5[:, :n_keys, 1].transpose(0, 2, 1, 3)
        v = qkv5[:, :n_keys, 2].transpose(0, 2, 1, 3)
        return _ref_attn(q, k, v).transpose(0, 2, 1, 3).reshape(b, n, c)

    got = fused_attention_dense(qkv, h, n_real=n_real, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref(qkv, n_real)), atol=1e-5)


def test_fused_attention_dense_vit_block_cpu_parity():
    """MultiHeadSelfAttention with the flag on CPU (fallback) matches the
    plain path bit-for-bit at d=64."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.models.common import (
        MultiHeadSelfAttention)

    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(2, 9, 128), jnp.float32)  # h=2, d=64
    m_plain = MultiHeadSelfAttention(head_nums=2)
    m_fused = MultiHeadSelfAttention(head_nums=2, use_fused_attention=True)
    params = m_plain.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(m_fused.apply(params, x)),
        np.asarray(m_plain.apply(params, x)), atol=1e-6)


def test_fused_attention_flag_dinov3_and_mae_parity():
    """use_fused_attention on DINOv3 (post-RoPE [B,H,N,D] path) and the
    MAE encoder/decoder is numerically the plain path on CPU (fallback),
    so enabling it in configs cannot change off-TPU results."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.models.backbones.dinov3_vit import (
        DinoVisionTransformer)

    rs = np.random.RandomState(12)
    kw = dict(patch_size=16, embedding_planes=128, block_nums=2,
              head_nums=2)
    d1 = DinoVisionTransformer(**kw)
    d2 = DinoVisionTransformer(use_fused_attention=True, **kw)
    x = jnp.asarray(rs.rand(1, 64, 64, 3), jnp.float32)
    v = d1.init(jax.random.PRNGKey(0), x)
    a1 = d1.apply(v, x)
    a2 = d2.apply(v, x)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)

    from simpleaicv_pytorch_training_examples_tpu.masked_image_modeling.models.vit_mae import (
        VITMAEPretrainModel)
    mae_kw = dict(encoder_embedding_planes=128, encoder_block_nums=2,
                  encoder_head_nums=2, decoder_embedding_planes=128,
                  decoder_block_nums=2, decoder_head_nums=2,
                  image_size=64)
    m1 = VITMAEPretrainModel(**mae_kw)
    m2 = VITMAEPretrainModel(use_fused_attention=True, **mae_kw)
    xi = jnp.asarray(rs.rand(2, 64, 64, 3), jnp.float32)
    vm = m1.init({"params": jax.random.PRNGKey(0),
                  "masking": jax.random.PRNGKey(1)}, xi)
    o1, _ = m1.apply(vm, xi)
    o2, _ = m2.apply(vm, xi)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_attn_block_interpret_fwd_bwd():
    """One-kernel LN1+qkv+attention+proj+residual block: fwd and all 7
    grads (dx + every weight) vs autodiff of the XLA composition."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.ops.pallas import attn_block as AB

    rs = np.random.RandomState(13)
    b, n, h, d = 2, 21, 4, 64
    c = h * d
    x = jnp.asarray(rs.randn(b, n, c) * 0.5, jnp.float32)
    wqkv = jnp.asarray(rs.randn(c, 3 * c) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rs.randn(3 * c) * 0.02, jnp.float32)
    wproj = jnp.asarray(rs.randn(c, c) * 0.05, jnp.float32)
    bproj = jnp.asarray(rs.randn(c) * 0.02, jnp.float32)
    gamma = jnp.asarray(1.0 + 0.1 * rs.randn(c), jnp.float32)
    beta = jnp.asarray(0.1 * rs.randn(c), jnp.float32)
    args = (x, wqkv, bqkv, wproj, bproj, gamma, beta)

    got = AB.attn_block(*args, head_nums=h, interpret=True)
    want = AB._reference_block(*args, head_nums=h, eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4)

    def loss_k(*a):
        y = AB.attn_block(*a, head_nums=h, interpret=True)
        return jnp.sum(y * y)

    def loss_r(*a):
        y = AB._reference_block(*a, head_nums=h, eps=1e-6)
        return jnp.sum(y * y)

    gk = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    names = ["dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dgamma",
             "dbeta"]
    for nm, a, b_ in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-3,
            rtol=2e-3, err_msg=nm)


def test_attn_block_in_vit_param_tree_and_parity():
    """use_fused_attention routes whole blocks through attn_block when
    drop-path is off: the param tree must be IDENTICAL to the plain
    model (checkpoint/optimizer-rule compatibility) and fwd+grads must
    match the plain path on CPU."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from simpleaicv_pytorch_training_examples_tpu.models.backbones.vit import ViT

    kw = dict(patch_size=8, embedding_planes=128, block_nums=2,
              head_nums=2, image_size=32, num_classes=5)
    m1 = ViT(**kw)
    m2 = ViT(use_fused_attention=True, use_fused_block=True, **kw)
    rs = np.random.RandomState(14)
    x = jnp.asarray(rs.rand(2, 32, 32, 3), jnp.float32)
    v = m1.init(jax.random.PRNGKey(0), x)
    v2 = m2.init(jax.random.PRNGKey(0), x)
    assert jtu.tree_structure(v) == jtu.tree_structure(v2)

    o1 = m1.apply(v, x)
    o2 = m2.apply(v, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-4)

    g1 = jax.grad(lambda v: (m1.apply(v, x) ** 2).sum())(v)
    g2 = jax.grad(lambda v: (m2.apply(v, x) ** 2).sum())(v)
    for p1, p2 in zip(jtu.tree_leaves(g1), jtu.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   atol=5e-3, rtol=5e-3)

    # with drop-path active in train mode the block must fall back to
    # the composable path (the kernel fuses the residual): still runs
    m3 = ViT(use_fused_attention=True, use_fused_block=True,
             drop_path_prob=0.1, **kw)
    o3 = m3.apply(v, x, train=True,
                  rngs={"dropout": jax.random.PRNGKey(2),
                        "droppath": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(o3)).all()


def test_fused_attention_bias_interpret_exact():
    """Biased variant (SAM windowed rel-pos): fwd + grads incl. the full
    [g,n,n] bias gradient vs autodiff of the reference."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.ops.pallas import (
        fused_attention)

    rs = np.random.RandomState(15)
    b, h, n, d = 2, 2, 25, 32
    q = jnp.asarray(rs.randn(b, h, n, d), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, n, d), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, n, d), jnp.float32)
    bias = jnp.asarray(rs.randn(b, h, n, n) * 0.3, jnp.float32)

    def ref(q, k, v, bias):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d**-0.5) + bias
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    out = fused_attention(q, k, v, bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref(q, k, v, bias)), atol=1e-5)

    gk = jax.grad(lambda *a: jnp.sum(
        fused_attention(*a[:3], bias=a[3], interpret=True) ** 2),
        argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2),
                  argnums=(0, 1, 2, 3))(q, k, v, bias)
    for nm, a, b_ in zip("qkvb", gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, err_msg=nm)


def test_sam_windowed_attention_fused_parity():
    """SAMAttention windowed path with use_flash on CPU (fallback) stays
    numerically the XLA rel-pos path."""
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models.segment_anything.image_encoder import (
        SAMAttention)

    rs = np.random.RandomState(16)
    x = jnp.asarray(rs.randn(3, 7, 7, 64), jnp.float32)  # windowed block
    m1 = SAMAttention(head_nums=2, input_size=(7, 7), use_flash=False)
    m2 = SAMAttention(head_nums=2, input_size=(7, 7), use_flash=True)
    v = m1.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(m2.apply(v, x)),
                               np.asarray(m1.apply(v, x)), atol=1e-5)


def test_pallas_kernels_shard_over_data_axis():
    """Under pjit with a data-sharded batch, the pallas custom-calls must
    PARTITION over axis 0 (ops/pallas/partitioning.py), not silently
    all-gather: zero all-gathers in fwd and grad HLO, numerics equal to
    the unsharded run, grads data-sharded."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from simpleaicv_pytorch_training_examples_tpu.ops.pallas.fused_attention import (
        fused_attention_dense)

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    rs = np.random.RandomState(17)
    qkv_h = rs.randn(16, 24, 3 * 128).astype(np.float32)
    qkv = jax.device_put(jnp.asarray(qkv_h),
                         NamedSharding(mesh, P("data", None, None)))

    f = jax.jit(lambda t: fused_attention_dense(t, 2, interpret=True))
    assert f.lower(qkv).compile().as_text().count("all-gather") == 0
    out = f(qkv)
    assert out.sharding.spec == P("data",)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(fused_attention_dense(jnp.asarray(qkv_h), 2,
                                         interpret=True)), atol=1e-6)

    g = jax.jit(jax.grad(lambda t: (fused_attention_dense(
        t, 2, interpret=True) ** 2).sum()))
    assert g.lower(qkv).compile().as_text().count("all-gather") == 0
    gv = g(qkv)
    assert gv.sharding.spec == P("data",)
    g_ref = jax.grad(lambda t: (fused_attention_dense(
        t, 2, interpret=True) ** 2).sum())(jnp.asarray(qkv_h))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(g_ref),
                               atol=1e-6)


def test_patch_embed_matches_conv():
    """PatchEmbed (einsum patchify) must be numerically equivalent to the
    nn.Conv form it replaces, with the identical param tree (kernel HWIO
    + bias) so torch converters and checkpoints are unaffected."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from simpleaicv_pytorch_training_examples_tpu.models.common import (
        PatchEmbed)

    p, c_in, c_out = 16, 3, 32
    pe = PatchEmbed(c_out, p)
    conv = nn.Conv(c_out, (p, p), strides=(p, p), padding="VALID")
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 64, 64, c_in), jnp.float32)

    v = pe.init(jax.random.PRNGKey(0), x)
    assert set(v["params"]) == {"kernel", "bias"}
    assert v["params"]["kernel"].shape == (p, p, c_in, c_out)  # HWIO

    out_pe = pe.apply(v, x)
    out_conv = conv.apply(v, x)  # same param tree drives nn.Conv
    assert out_pe.shape == (2, 4, 4, c_out)
    np.testing.assert_allclose(np.asarray(out_pe), np.asarray(out_conv),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_relwin_interpret_exact():
    """Decomposed rel-pos windowed kernel == materialized-bias reference
    (fwd and every gradient), interpret mode at a tiny window."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.ops.pallas.fused_attention import (
        fused_attention_relwin)

    kh, kw = 3, 4
    b, h, n, d = 2, 2, kh * kw, 8
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(b, h, n, d), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, n, d), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, n, d), jnp.float32)
    rel_h = jnp.asarray(rs.randn(b, h, n, kh), jnp.float32)
    rel_w = jnp.asarray(rs.randn(b, h, n, kw), jnp.float32)

    def ref(q, k, v, rel_h, rel_w):
        bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(
            b, h, n, n)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d ** -0.5) + bias
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    got = fused_attention_relwin(q, k, v, rel_h, rel_w, interpret=True)
    want = ref(q, k, v, rel_h, rel_w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)

    def loss(fn, *args):
        return (fn(*args) ** 2).mean()

    g_got = jax.grad(lambda *a: loss(
        lambda *x: fused_attention_relwin(*x, interpret=True), *a),
        argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    g_want = jax.grad(lambda *a: loss(ref, *a),
                      argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    for gg, gw, name in zip(g_got, g_want, "q k v rel_h rel_w".split()):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   atol=3e-5, rtol=1e-4,
                                   err_msg=f"d{name}")


def test_fused_attention_relwin_dense_interpret_exact():
    """Packed zero-copy windowed rel-pos kernel == materialized-bias
    reference (fwd + dqkv/drel gradients), interpret mode. d=64 exercises
    the head-pair lane masking; qkv/rel arrive packed as in SAMAttention's
    round-5 windowed path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.ops.pallas.fused_attention import (
        fused_attention_relwin_dense)

    kh, kw, nh, d = 3, 4, 2, 64
    b, n, c = 2, kh * kw, nh * d
    rs = np.random.RandomState(0)
    qkv = jnp.asarray(rs.randn(b, n, 3 * c), jnp.float32)
    rel_h = jnp.asarray(rs.randn(b, n, nh, kh), jnp.float32)
    rel_w = jnp.asarray(rs.randn(b, n, nh, kw), jnp.float32)

    def ref(qkv, rel_h, rel_w):
        qkv5 = qkv.reshape(b, n, 3, nh, d)
        q, k, v = (qkv5[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(
            b, n, nh, n).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d ** -0.5) + bias
        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        return out.transpose(0, 2, 1, 3).reshape(b, n, c)

    got = fused_attention_relwin_dense(qkv, rel_h, rel_w, nh,
                                       interpret=True)
    want = ref(qkv, rel_h, rel_w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)

    def loss(fn, *args):
        return (fn(*args) ** 2).mean()

    g_got = jax.grad(lambda *a: loss(
        lambda *x: fused_attention_relwin_dense(*x, nh, interpret=True),
        *a), argnums=(0, 1, 2))(qkv, rel_h, rel_w)
    g_want = jax.grad(lambda *a: loss(ref, *a),
                      argnums=(0, 1, 2))(qkv, rel_h, rel_w)
    for gg, gw, name in zip(g_got, g_want, "qkv rel_h rel_w".split()):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   atol=3e-5, rtol=1e-4,
                                   err_msg=f"d{name}")


def test_hiera_head_dim_padding_exact():
    """head_dim_padding=64 with zero-padded params == the unpadded d=56
    Hiera bit-for-bit (fp32, CPU): zero q/k dims add nothing to logits at
    the preserved 56^-0.5 scale, padded v columns feed zero proj rows."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.image_encoder import (
        Hiera)

    kwargs = dict(embedding_planes=112, head_nums=2, block_nums=(1, 1, 2, 1),
                  global_attention_blocks=(3,),
                  window_specification=(8, 4, 14, 7))
    m0 = Hiera(**kwargs)
    m1 = Hiera(**kwargs, head_dim_padding=64)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(1, 128, 128, 3), jnp.float32)
    v0 = m0.init(jax.random.PRNGKey(0), x)

    def pad_tree(params):
        import copy
        out = copy.deepcopy(jax.tree.map(np.asarray, params))
        for name, block in out.items():
            if not name.startswith("block_"):
                continue
            attn = block["attn"]
            w = attn["qkv"]["kernel"]
            c_in, o = w.shape
            nh = o // (3 * 56)
            attn["qkv"]["kernel"] = np.pad(
                w.reshape(c_in, 3, nh, 56),
                ((0, 0), (0, 0), (0, 0), (0, 8))).reshape(c_in, -1)
            attn["qkv"]["bias"] = np.pad(
                attn["qkv"]["bias"].reshape(3, nh, 56),
                ((0, 0), (0, 0), (0, 8))).reshape(-1)
            attn["proj"]["kernel"] = np.pad(
                attn["proj"]["kernel"].reshape(nh, 56, -1),
                ((0, 0), (0, 8), (0, 0))).reshape(nh * 64, -1)
        return out

    v1 = {"params": pad_tree(v0["params"])}
    # shape check vs a fresh padded init
    ref_shapes = jax.tree.map(lambda a: a.shape,
                              m1.init(jax.random.PRNGKey(0), x)["params"])
    got_shapes = jax.tree.map(lambda a: a.shape, v1["params"])
    assert ref_shapes == got_shapes

    o0 = m0.apply(v0, x)
    o1 = m1.apply(v1, x)
    for a, b in zip(o0, o1):
        # exact up to reduction-tree float noise: the wider (64 vs 56)
        # contraction changes XLA's summation order (measured <= 4e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=0)


def test_conv3x3s2_matches_nn_conv():
    """Conv3x3S2 (slice+dot rewrite of the SAM2 memory-encoder mask
    downsampler, models/common.py) == nn.Conv(3x3, s2, pad1): same param
    tree, same forward, same grads (reduction-order noise only)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from simpleaicv_pytorch_training_examples_tpu.models.common import (
        Conv3x3S2)

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 16, 24, 5), jnp.float32)
    ref = nn.Conv(7, (3, 3), strides=(2, 2), padding=1)
    new = Conv3x3S2(7)
    v = ref.init(jax.random.PRNGKey(0), x)
    assert (jax.tree.map(lambda a: a.shape, v) ==
            jax.tree.map(lambda a: a.shape,
                         new.init(jax.random.PRNGKey(0), x)))
    np.testing.assert_allclose(np.asarray(ref.apply(v, x)),
                               np.asarray(new.apply(v, x)),
                               atol=1e-6, rtol=0)
    g_ref = jax.grad(lambda p: jnp.sum(jnp.sin(ref.apply(p, x))))(v)
    g_new = jax.grad(lambda p: jnp.sum(jnp.sin(new.apply(p, x))))(v)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-6),
        g_ref, g_new)


def test_patchembed_matches_2x2_strided_conv():
    """PatchEmbed(p=2) == nn.Conv((2,2), s2) — the SAM prompt-encoder
    mask-downscaler rewrite (prompt_encoder.py mask_conv1/2)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from simpleaicv_pytorch_training_examples_tpu.models.common import (
        PatchEmbed)

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 12, 12, 4), jnp.float32)
    ref = nn.Conv(16, (2, 2), strides=(2, 2))
    new = PatchEmbed(16, 2)
    v = ref.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(np.asarray(ref.apply(v, x)),
                               np.asarray(new.apply(v, x)),
                               atol=1e-6, rtol=0)
