"""Shared single-image predictors for the inference / gradio demos.

Parity surface: /root/reference/gradio_demo/*.py (15 demos) — each demo
there builds one model + checkpoint, preprocesses one image, decodes and
visualizes. Here the per-task predict functions are shared between the CLI
inference demos and the gradio wrappers.
"""

import os
import sys

import numpy as np

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)

_PALETTE = None


def palette(n=256):
    global _PALETTE
    if _PALETTE is None:
        rs = np.random.RandomState(0)
        _PALETTE = rs.randint(0, 255, (n, 3)).astype(np.uint8)
        _PALETTE[0] = 0
    return _PALETTE


def load_image(path):
    import cv2
    return cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB).astype(
        np.float32)


def pad_resize(image, resize, mean=(0, 0, 0), std=(1, 1, 1),
               scale=1 / 255.0):
    """YOLO-style keep-ratio resize onto a square canvas; returns
    (canvas [1,R,R,3] float32, factor)."""
    import cv2
    h, w = image.shape[:2]
    factor = resize / max(h, w)
    rh, rw = int(round(h * factor)), int(round(w * factor))
    canvas = np.zeros((resize, resize, 3), np.float32)
    canvas[:rh, :rw] = cv2.resize(image, (rw, rh))
    canvas = (canvas * scale - np.asarray(mean, np.float32)) / \
        np.asarray(std, np.float32)
    return canvas[None], factor


def build(model, input_hw, checkpoint=""):
    """init + restore; returns (params, variables, jitted forward)."""
    import jax

    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        load_state_dict)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained, init_model)

    load_state_dict(checkpoint, model)
    params, variables = init_model(model, (1, *input_hw, 3),
                                   jax.random.PRNGKey(0))
    params = apply_pretrained(model, params)

    @jax.jit
    def forward(params, x):
        return model.apply({"params": params, **variables}, x, train=False)

    return params, forward


def overlay_mask(image, mask, color=(0, 255, 0), alpha=0.5):
    """image uint8 [H,W,3]; mask [H,W] {0,1} -> blended overlay."""
    out = image.copy().astype(np.float32)
    m = mask.astype(bool)
    out[m] = out[m] * (1 - alpha) + np.asarray(color, np.float32) * alpha
    return out.astype(np.uint8)


def colorize_classes(class_map):
    return palette()[class_map.astype(np.int64) % 256]


def draw_boxes(image, boxes, scores=None, color=(255, 0, 0)):
    import cv2
    out = image.copy()
    for i, b in enumerate(boxes):
        x0, y0, x1, y1 = [int(v) for v in b[:4]]
        cv2.rectangle(out, (x0, y0), (x1, y1), color, 2)
        if scores is not None:
            cv2.putText(out, f"{scores[i]:.2f}", (x0, max(y0 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return out


def draw_polys(image, polys, color=(255, 0, 0)):
    import cv2
    out = image.copy()
    for poly in polys:
        cv2.polylines(out, [np.round(poly).astype(np.int32)], True, color,
                      2)
    return out


# ---------------- per-task predictors ----------------

def predict_semantic(image, network, checkpoint, num_classes, resize=512,
                     factory_module=None):
    import jax.numpy as jnp
    if factory_module is None:
        from simpleaicv_pytorch_training_examples_tpu.semantic_segmentation import (
            models as factory_module)
    model = factory_module.__dict__[network](num_classes=num_classes)
    x, factor = pad_resize(image, resize)
    params, forward = build(model, (resize, resize), checkpoint)
    pred = np.asarray(forward(params, jnp.asarray(x)))[0]
    class_map = pred.argmax(-1)
    h, w = image.shape[:2]
    rh, rw = int(round(h * factor)), int(round(w * factor))
    import cv2
    class_map = cv2.resize(class_map[:rh, :rw].astype(np.uint8), (w, h),
                           interpolation=cv2.INTER_NEAREST)
    return class_map


def predict_salient_or_matting(image, network, checkpoint, resize=832,
                               matting=False):
    import jax.numpy as jnp
    if matting:
        from simpleaicv_pytorch_training_examples_tpu.human_matting import (
            models as factory)
    else:
        from simpleaicv_pytorch_training_examples_tpu.salient_object_detection import (
            models as factory)
    model = factory.__dict__[network]()
    x, factor = pad_resize(image, resize)
    params, forward = build(model, (resize, resize), checkpoint)
    out = forward(params, jnp.asarray(x))
    # matting returns (global, local, fused); SOD returns a sigmoid map
    pred = np.asarray(out[2] if isinstance(out, (tuple, list)) else out)[0]
    pred = pred[..., 0] if pred.ndim == 3 else pred
    import cv2
    h, w = image.shape[:2]
    rh, rw = int(round(h * factor)), int(round(w * factor))
    return cv2.resize(pred[:rh, :rw], (w, h))


def predict_detection(image, network, checkpoint, num_classes=80,
                      resize=1024, score_threshold=0.3):
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.detection.decode import (
        RetinaDecoder)
    from simpleaicv_pytorch_training_examples_tpu.detection.models import (
        retinanet)
    model = retinanet.__dict__[network](num_classes=num_classes)
    x, factor = pad_resize(image, resize,
                           mean=(0.485, 0.456, 0.406),
                           std=(0.229, 0.224, 0.225))
    params, forward = build(model, (resize, resize), checkpoint)
    preds = forward(params, jnp.asarray(x))
    decoder = RetinaDecoder(min_score_threshold=score_threshold)
    scores, classes, boxes = [np.asarray(v)[0] for v in decoder(preds)]
    keep = scores > score_threshold
    return boxes[keep] / factor, scores[keep], classes[keep]


def predict_text_detection(image, network, checkpoint, resize=1024):
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.text_detection import (
        models as tmodels)
    from simpleaicv_pytorch_training_examples_tpu.text_detection.decode import (
        DBNetDecoder)
    model = tmodels.__dict__[network]()
    x, factor = pad_resize(image, resize)
    params, forward = build(model, (resize, resize), checkpoint)
    preds = np.asarray(forward(params, jnp.asarray(x)))
    h, w = image.shape[:2]
    rh, rw = int(round(h * factor)), int(round(w * factor))
    boxes = DBNetDecoder()(preds, [(rh, rw)])[0]
    return [(poly / factor, score) for poly, score in boxes]


def predict_text_recognition(image, network, checkpoint, chars_file=None,
                             resize_h=32, max_w=512):
    import cv2
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.text_recognition import (
        models as rmodels)
    from simpleaicv_pytorch_training_examples_tpu.text_recognition.char_sets import (
        FINAL_CHAR_TABLE)
    from simpleaicv_pytorch_training_examples_tpu.text_recognition.common import (
        CTCTextLabelConverter)
    # default to the shipped 12,111-char merged table
    converter = CTCTextLabelConverter(
        chars_file=chars_file or FINAL_CHAR_TABLE)
    model = rmodels.__dict__[network](num_classes=converter.num_classes)
    h, w = image.shape[:2]
    rw = min(max(1, int(round(w * resize_h / h))), max_w)
    canvas = np.zeros((resize_h, max_w, 3), np.float32)
    canvas[:, :rw] = cv2.resize(image, (rw, resize_h))
    x = (canvas / 255.0)[None].astype(np.float32)
    params, forward = build(model, (resize_h, max_w), checkpoint)
    logits = np.asarray(forward(params, jnp.asarray(x)))[0]
    return converter.decode_batch(logits[None])[0]


def predict_face_detection(image, network, checkpoint, resize=1024,
                           score_threshold=0.5):
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.face_detection import (
        models as fmodels)
    from simpleaicv_pytorch_training_examples_tpu.face_detection.decode import (
        RetinaFaceDecoder)
    model = fmodels.__dict__[network]()
    x, factor = pad_resize(image, resize,
                           mean=(0.485, 0.456, 0.406),
                           std=(0.229, 0.224, 0.225))
    params, forward = build(model, (resize, resize), checkpoint)
    preds = forward(params, jnp.asarray(x))
    scores, classes, boxes = [np.asarray(v)[0]
                              for v in RetinaFaceDecoder()(preds)]
    keep = scores > score_threshold
    return boxes[keep] / factor, scores[keep]


def predict_instance(image, network, checkpoint, num_classes=80,
                     resize=1024, score_threshold=0.3):
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.instance_segmentation.decode import (
        SOLOV2Decoder)
    from simpleaicv_pytorch_training_examples_tpu.instance_segmentation.models import (
        solov2)
    model = solov2.__dict__[network](num_classes=num_classes)
    x, factor = pad_resize(image, resize,
                           mean=(0.485, 0.456, 0.406),
                           std=(0.229, 0.224, 0.225))
    params, forward = build(model, (resize, resize), checkpoint)
    preds = forward(params, jnp.asarray(x))
    scores, classes, masks = [np.asarray(v)[0]
                              for v in SOLOV2Decoder()(preds)]
    keep = scores > score_threshold
    return scores[keep], classes[keep], masks[keep]


def predict_sam(image, points, network, checkpoint, resize=1024,
                point_labels=None):
    """points: [[x, y], ...] in original-image coords."""
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models import (
        segment_anything)
    model = segment_anything.__dict__[network](image_size=resize)
    x, factor = pad_resize(image, resize)
    pts = np.full((1, max(len(points), 1), 3), -1.0, np.float32)
    for i, p in enumerate(points):
        label = 1.0 if point_labels is None else float(point_labels[i])
        pts[0, i] = [p[0] * factor, p[1] * factor, label]
    prompts = {"prompt_point": pts, "prompt_box": None, "prompt_mask": None}
    import jax

    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        load_state_dict)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained)
    load_state_dict(checkpoint, model)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, resize, resize, 3)), prompts)
    params = apply_pretrained(model, variables.pop("params"))

    @jax.jit
    def forward(params, x, pts):
        return model.apply({"params": params, **variables}, x,
                           {"prompt_point": pts, "prompt_box": None,
                            "prompt_mask": None})

    masks, ious = forward(params, jnp.asarray(x), jnp.asarray(pts))
    masks, ious = np.asarray(masks)[0], np.asarray(ious)[0]
    best = masks[ious.argmax()] > 0
    import cv2
    h, w = image.shape[:2]
    rh, rw = int(round(h * factor)), int(round(w * factor))
    return cv2.resize(best[:rh, :rw].astype(np.uint8), (w, h),
                      interpolation=cv2.INTER_NEAREST)


def predict_sam_box(image, box, network, checkpoint, resize=1024):
    """box: [x1, y1, x2, y2] in original-image coords — the box-prompt
    path the reference circle-target gradio demo uses (it converts the
    brushed region's bounding rect into a prompt box,
    /root/reference/gradio_demo/13.0.1.gradio_sam_circle_target_single_image.py:115-133)."""
    import jax
    import jax.numpy as jnp

    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        load_state_dict)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained)
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.models import (
        segment_anything)
    model = segment_anything.__dict__[network](image_size=resize)
    x, factor = pad_resize(image, resize)
    boxes = np.asarray([[b * factor for b in box]], np.float32)
    prompts = {"prompt_point": None, "prompt_box": boxes,
               "prompt_mask": None}
    load_state_dict(checkpoint, model)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, resize, resize, 3)), prompts)
    params = apply_pretrained(model, variables.pop("params"))

    @jax.jit
    def forward(params, x, boxes):
        return model.apply({"params": params, **variables}, x,
                           {"prompt_point": None, "prompt_box": boxes,
                            "prompt_mask": None})

    masks, ious = forward(params, jnp.asarray(x), jnp.asarray(boxes))
    masks, ious = np.asarray(masks)[0], np.asarray(ious)[0]
    best = masks[ious.argmax()] > 0
    import cv2
    h, w = image.shape[:2]
    rh, rw = int(round(h * factor)), int(round(w * factor))
    return cv2.resize(best[:rh, :rw].astype(np.uint8), (w, h),
                      interpolation=cv2.INTER_NEAREST)


def predict_universal(image, network, checkpoint, num_classes, resize=512,
                      matting=False):
    import jax.numpy as jnp
    from simpleaicv_pytorch_training_examples_tpu.universal_segmentation import (
        models as umodels)
    from simpleaicv_pytorch_training_examples_tpu.universal_segmentation.segmentation_decode import (
        UniversalSegmentationDecoder)
    model = umodels.__dict__[network](image_size=resize,
                                      num_classes=num_classes)
    x, factor = pad_resize(image, resize)
    params, forward = build(model, (resize, resize), checkpoint)
    out = forward(params, jnp.asarray(x))
    if matting:  # (global, local, fused, class_preds)
        pred = np.asarray(out[2])[0]
        pred = pred[..., 0] if pred.ndim == 3 else pred
    else:
        decoder = UniversalSegmentationDecoder(num_classes=num_classes,
                                               mode="semantic")
        pred = decoder((out[0], out[1]))[0].astype(np.uint8)
    import cv2
    h, w = image.shape[:2]
    rh, rw = int(round(h * factor)), int(round(w * factor))
    interp = cv2.INTER_LINEAR if matting else cv2.INTER_NEAREST
    return cv2.resize(pred[:rh, :rw], (w, h), interpolation=interp)
