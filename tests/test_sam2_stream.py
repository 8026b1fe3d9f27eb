"""SAM2 streaming tracker: the jitted per-frame step must reproduce the
training model's batched forward exactly (same params, same frames)."""

import numpy as np


def test_stream_matches_batched_forward():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2 import (
        SAM2Video)
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2_stream import (
        SAM2VideoStream)

    kw = dict(image_size=128, embedding_planes=32, head_nums=1,
              block_nums=(1, 1, 2, 1), window_specification=(4, 2, 4, 2),
              global_attention_blocks=(3,), fpn_planes=32,
              memory_planes=16, memory_mask_nums=3, max_object_pointers=4)
    train_model = SAM2Video(**kw)
    stream_model = SAM2VideoStream(**kw)

    b, t = 1, 3
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(b, t, 128, 128, 3).astype(np.float32))
    prompts = {"prompt_point": jnp.asarray([[[40.0, 40.0, 1.0]]]),
               "prompt_box": None, "prompt_mask": None}
    variables = train_model.init(jax.random.PRNGKey(0), images, prompts)

    ref_masks, ref_ious, ref_obj = train_model.apply(variables, images,
                                                     prompts)

    encode = jax.jit(lambda v, im: stream_model.apply(
        v, im, method=SAM2VideoStream.encode_frame))
    start = jax.jit(lambda v, f, p: stream_model.apply(
        v, f, p, method=SAM2VideoStream.start_track))
    step = jax.jit(lambda v, f, pos, c: stream_model.apply(
        v, f, pos, c, method=SAM2VideoStream.track_frame))

    feat0, _ = encode(variables, images[:, 0])
    (m0, i0, o0), carry = start(variables, feat0, prompts)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(ref_masks[:, 0]),
                               atol=1e-4)
    outs = [(m0, i0, o0)]
    for f in range(1, t):
        feat, pos = encode(variables, images[:, f])
        out, carry = step(variables, feat, pos, carry)
        outs.append(out)

    for f in range(t):
        np.testing.assert_allclose(np.asarray(outs[f][0]),
                                   np.asarray(ref_masks[:, f]), atol=1e-3)
        np.testing.assert_allclose(np.asarray(outs[f][1]),
                                   np.asarray(ref_ious[:, f]), atol=1e-3)
    # and the carry advanced
    assert int(carry["frame_idx"]) == t


def test_scan_loop_matches_python_loop():
    import jax
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.models.segment_anything2.sam2 import (
        SAM2Video)

    kw = dict(image_size=128, embedding_planes=32, head_nums=1,
              block_nums=(1, 1, 2, 1), window_specification=(4, 2, 4, 2),
              global_attention_blocks=(3,), fpn_planes=32,
              memory_planes=16, memory_mask_nums=3, max_object_pointers=4)
    loop_model = SAM2Video(**kw)
    scan_model = SAM2Video(use_scan=True, **kw)

    rs = np.random.RandomState(1)
    images = jnp.asarray(rs.rand(1, 3, 128, 128, 3).astype(np.float32))
    prompts = {"prompt_point": jnp.asarray([[[40.0, 40.0, 1.0]]]),
               "prompt_box": None, "prompt_mask": None}
    variables = loop_model.init(jax.random.PRNGKey(0), images, prompts)

    m1, i1, o1 = loop_model.apply(variables, images, prompts)
    m2, i2, o2 = scan_model.apply(variables, images, prompts)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
