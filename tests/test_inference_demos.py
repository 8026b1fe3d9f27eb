"""Inference-demo predictors (inference_demo/_predictors.py) drive
end-to-end on synthetic images with small random-init models — the
single-image demo surface that mirrors the reference's
inference_demo/*.py scripts."""

import os
import sys

import numpy as np
import pytest

DEMO = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "inference_demo")
sys.path.insert(0, DEMO)


@pytest.fixture(scope="module")
def image():
    return (np.random.RandomState(0).rand(96, 128, 3) * 255).astype(
        np.uint8)


def test_predict_semantic_demo(image):
    from _predictors import predict_semantic

    class_map = predict_semantic(
        image, "resnet18_pfan_semantic_segmentation", "", num_classes=7,
        resize=64)
    assert class_map.shape == image.shape[:2]
    assert class_map.max() < 7


def test_predict_detection_demo(image):
    from _predictors import predict_detection

    boxes, scores, classes = predict_detection(
        image, "resnet18_retinanet", "", num_classes=10, resize=128,
        score_threshold=0.0)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert len(scores) == len(boxes) == len(classes)


def test_predict_text_recognition_demo(image):
    from _predictors import predict_text_recognition

    text = predict_text_recognition(image, "resnet18_ctc_model", "")
    assert isinstance(text, str)


def test_bundled_sample_images():
    """Every demo task ships bundled sample images (reference bundles
    gradio_demo/test_*_images/ photos; zero-egress repo bundles
    deterministic synthetic scenes via make_sample_images.py) and every
    gradio app lists them as gr.Examples."""
    import glob

    import cv2

    sys.path.insert(0, os.path.join(os.path.dirname(DEMO), "gradio_demo"))
    from make_sample_images import TASKS, sample_images

    for task in TASKS:
        paths = sample_images(task)
        assert paths, task
        for p in paths:
            img = cv2.imread(p)
            assert img is not None and img.ndim == 3, p
            assert min(img.shape[:2]) >= 64, (p, img.shape)

    wired = [f for f in glob.glob(os.path.join(
        os.path.dirname(DEMO), "gradio_demo", "*gradio*.py"))
        if "sample_images(" in open(f).read()]
    assert len(wired) >= 15, len(wired)


def test_predict_sam_box_circle_demo(image):
    """Circle-target gradio/CLI demo path: brushed-layer alpha ->
    bounding box -> SAM box prompt (reference gradio 13.0.1)."""
    sys.path.insert(0, os.path.join(os.path.dirname(DEMO), "gradio_demo"))
    import importlib
    circle = importlib.import_module(
        "13_0_1_gradio_sam_circle_target_single_image")
    from _predictors import predict_sam_box

    layer = np.zeros(image.shape[:2] + (4,), np.uint8)
    layer[30:60, 40:90, 3] = 255  # brushed ring region
    editor_value = {"background": image, "layers": [layer],
                    "composite": image}
    img, box = circle.extract_circle_box(editor_value)
    assert img is not None
    assert box == [40.0, 30.0, 90.0, 60.0]

    mask = predict_sam_box(img, box, "sam_b", "", resize=128)
    assert mask.shape == image.shape[:2]
    assert set(np.unique(mask)) <= {0, 1}

    # nothing drawn -> graceful None
    assert circle.extract_circle_box(
        {"background": image, "layers": [np.zeros_like(layer)],
         "composite": image}) == (None, None)
