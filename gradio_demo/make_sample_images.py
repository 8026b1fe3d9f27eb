"""Generate the bundled demo sample images.

The reference ships real photos per task (`/root/reference/gradio_demo/
test_*_images/`); this repo has zero network egress, so the bundled
samples are deterministic synthetic scenes shaped for each task's
predictor: colored shapes for classification/detection/segmentation,
rendered text for OCR, a cartoon face for face tasks, a soft-edged
foreground blob for matting/SOD. Regenerate with:

    python gradio_demo/make_sample_images.py

Every `*_gradio_*.py` app auto-lists its task's images as gr.Examples
via `sample_images(task)` below.
"""

import glob
import os

import numpy as np

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "test_images")

TASKS = ("classification", "detection", "semantic_segmentation",
         "instance_segmentation", "salient_object_detection",
         "human_matting", "text_detection", "text_recognition",
         "face_detection", "face_parsing", "human_parsing",
         "interactive_segmentation", "universal_segmentation",
         "universal_matting")


def sample_images(task):
    """Bundled sample-image paths for a demo task (gr.Examples input)."""
    return sorted(glob.glob(os.path.join(BASE, task, "*.png")))


def _canvas(w=480, h=360, seed=0):
    rs = np.random.RandomState(seed)
    ramp = np.linspace(90, 170, h, dtype=np.float32)[:, None, None]
    img = np.broadcast_to(ramp, (h, w, 3)).copy()
    # structured low-frequency variation only — per-pixel noise would
    # make the bundled PNGs incompressible
    xs = np.linspace(0, np.pi * 3, w, dtype=np.float32)
    img += 8 * np.sin(xs)[None, :, None]
    return img, rs


def _disk(img, cy, cx, r, color, soft=0.0):
    h, w = img.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    d = np.sqrt((yy - cy)**2 + (xx - cx)**2)
    a = np.clip((r - d) / max(soft, 1.0), 0, 1)[..., None] if soft else \
        (d <= r)[..., None].astype(np.float32)
    return img * (1 - a) + a * np.asarray(color, np.float32)


def _rect(img, y0, x0, y1, x1, color):
    img = img.copy()
    img[y0:y1, x0:x1] = color
    return img


def _scene_shapes(seed):
    img, rs = _canvas(seed=seed)
    for _ in range(3):
        cy, cx = rs.randint(60, 300), rs.randint(60, 420)
        img = _disk(img, cy, cx, rs.randint(25, 60),
                    rs.randint(30, 230, 3))
    y0, x0 = rs.randint(30, 200), rs.randint(30, 300)
    img = _rect(img, y0, x0, y0 + rs.randint(40, 110),
                x0 + rs.randint(50, 140), rs.randint(30, 230, 3))
    return img


def _scene_face(seed):
    img, rs = _canvas(seed=seed)
    cy, cx = 180 + rs.randint(-20, 20), 240 + rs.randint(-40, 40)
    img = _disk(img, cy, cx, 90, (224, 190, 160), soft=3)    # head
    for dx in (-32, 32):                                     # eyes
        img = _disk(img, cy - 25, cx + dx, 12, (250, 250, 250))
        img = _disk(img, cy - 25, cx + dx, 6, (40, 40, 60))
    img = _disk(img, cy + 20, cx, 8, (190, 150, 130))        # nose
    img = _rect(img, cy + 45, cx - 25, cy + 52, cx + 25,     # mouth
                (150, 70, 70))
    img = _rect(img, cy - 95, cx - 70, cy - 60, cx + 70,     # hair
                (60, 45, 35))
    return img


def _scene_person(seed):
    img, rs = _canvas(seed=seed)
    cx = 240 + rs.randint(-50, 50)
    img = _disk(img, 110, cx, 42, (222, 188, 158), soft=4)   # head
    img = _rect(img, 150, cx - 55, 300, cx + 55, (70, 90, 160))  # torso
    img = _rect(img, 300, cx - 45, 355, cx - 12, (50, 50, 70))   # legs
    img = _rect(img, 300, cx + 12, 355, cx + 45, (50, 50, 70))
    return img


def _scene_text(seed, word="TPU-2026"):
    img, _ = _canvas(w=256, h=64, seed=seed)
    img[:] = 245
    # 5x7 bitmap font for A-Z, 0-9, '-'
    glyphs = {
        "T": ["#####", "..#..", "..#..", "..#..", "..#..", "..#..",
              "..#.."],
        "P": ["####.", "#...#", "#...#", "####.", "#....", "#....",
              "#...."],
        "U": ["#...#", "#...#", "#...#", "#...#", "#...#", "#...#",
              ".###."],
        "-": [".....", ".....", ".....", "#####", ".....", ".....",
              "....."],
        "2": [".###.", "#...#", "....#", "...#.", "..#..", ".#...",
              "#####"],
        "0": [".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#",
              ".###."],
        "6": [".###.", "#....", "#....", "####.", "#...#", "#...#",
              ".###."],
    }
    x = 12
    for ch in word:
        g = glyphs.get(ch)
        if g is None:
            x += 18
            continue
        for r, row in enumerate(g):
            for c, bit in enumerate(row):
                if bit == "#":
                    img[14 + r * 5:14 + r * 5 + 5,
                        x + c * 4:x + c * 4 + 4] = (20, 20, 30)
        x += 26
    return img


def main():
    for task in TASKS:
        d = os.path.join(BASE, task)
        os.makedirs(d, exist_ok=True)
        if task in ("face_detection", "face_parsing"):
            scenes = [_scene_face(1), _scene_face(2)]
        elif task in ("human_matting", "human_parsing",
                      "salient_object_detection", "universal_matting"):
            scenes = [_scene_person(3), _scene_person(4)]
        elif task in ("text_detection", "text_recognition"):
            scenes = [_scene_text(5), _scene_text(6, word="T-20")]
        else:
            scenes = [_scene_shapes(7), _scene_shapes(8)]
        for i, img in enumerate(scenes):
            arr = np.clip(img, 0, 255).astype(np.uint8)
            path = os.path.join(d, f"sample_{i}.png")
            try:
                import cv2
                cv2.imwrite(path, arr[:, :, ::-1])
            except ImportError:
                from PIL import Image
                Image.fromarray(arr).save(path)
            print("wrote", path)


if __name__ == "__main__":
    main()
