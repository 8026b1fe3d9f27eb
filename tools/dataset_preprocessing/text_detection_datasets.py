"""Convert public OCR detection datasets into this framework's layout
(<out>/<set_type>/image.jpg + image.json with
{"shapes": [{"points": [[x,y]...], "label": text}, ...]};
label "###" marks illegible regions).

Consolidates /root/reference/SimpleAICV/text_detection/
text_detection_dataset_processing/{001.processing_rctw,002.processing_art,
003.processing_lsvt,004.processing_mlt,005.processing_rects}.py into one
entry with --format. Half-width punctuation normalization matches the
reference (its half_full_dict).

Usage:
  python text_detection_datasets.py --format rctw --image-dir imgs \
      --annot-dir gts --output-dir out --train-ratio 0.9
"""

import argparse
import json
import os
import random

_HALF_FULL = {"，": ",", "；": ";", "：": ":", "？": "?", "（": "(",
              "）": ")", "！": "!"}


def _norm_text(t):
    return "".join(_HALF_FULL.get(c, c) for c in t.strip())


def parse_rctw(annot_path):
    """RCTW/MLT txt: x1,y1,x2,y2,x3,y3,x4,y4[,lang],"text" per line."""
    shapes = []
    with open(annot_path, encoding="utf-8-sig") as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 9:
                continue
            pts = [[float(parts[i]), float(parts[i + 1])]
                   for i in range(0, 8, 2)]
            text = ",".join(parts[9:]) if len(parts) > 9 else parts[8]
            text = _norm_text(text.strip().strip('"'))
            shapes.append({"points": pts, "label": text or "###"})
    return shapes


def parse_art_lsvt(entries):
    """ArT/LSVT json entries: [{points, transcription, illegibility}]."""
    shapes = []
    for e in entries:
        text = "###" if e.get("illegibility") else \
            _norm_text(e.get("transcription", ""))
        shapes.append({"points": [[float(x), float(y)]
                                  for x, y in e["points"]],
                       "label": text or "###"})
    return shapes


def parse_rects(annot_path):
    """ReCTS json: {"lines": [{"points": [x1,y1,...], "transcription",
    "ignore"}]}."""
    with open(annot_path, encoding="utf-8") as f:
        data = json.load(f)
    shapes = []
    for line in data.get("lines", []):
        flat = line["points"]
        pts = [[float(flat[i]), float(flat[i + 1])]
               for i in range(0, len(flat), 2)]
        text = "###" if line.get("ignore") else \
            _norm_text(line.get("transcription", ""))
        shapes.append({"points": pts, "label": text or "###"})
    return shapes


def main():
    import cv2
    p = argparse.ArgumentParser(
        description="convert OCR detection datasets")
    p.add_argument("--format", required=True,
                   choices=("rctw", "mlt", "art", "lsvt", "rects"))
    p.add_argument("--image-dir", required=True)
    p.add_argument("--annot-dir", default="",
                   help="per-image txt/json dir (rctw/mlt/rects)")
    p.add_argument("--annot-json", default="",
                   help="single json of all images (art/lsvt)")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--train-ratio", type=float, default=0.9)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    global_annots = {}
    if args.annot_json:
        with open(args.annot_json, encoding="utf-8") as f:
            global_annots = json.load(f)

    names = sorted(n for n in os.listdir(args.image_dir)
                   if n.lower().endswith((".jpg", ".jpeg", ".png")))
    rng = random.Random(args.seed)
    rng.shuffle(names)
    n_train = int(len(names) * args.train_ratio)
    n_done = 0
    for i, name in enumerate(names):
        stem = os.path.splitext(name)[0]
        if args.format in ("rctw", "mlt"):
            ap = os.path.join(args.annot_dir, stem + ".txt")
            if not os.path.exists(ap):
                ap = os.path.join(args.annot_dir, "gt_" + stem + ".txt")
            if not os.path.exists(ap):
                continue
            shapes = parse_rctw(ap)
        elif args.format == "rects":
            ap = os.path.join(args.annot_dir, stem + ".json")
            if not os.path.exists(ap):
                continue
            shapes = parse_rects(ap)
        else:  # art / lsvt: keys may carry a gt_ prefix
            entries = global_annots.get(stem) or \
                global_annots.get("gt_" + stem)
            if entries is None:
                continue
            shapes = parse_art_lsvt(entries)
        if not shapes:
            continue
        img = cv2.imread(os.path.join(args.image_dir, name))
        if img is None:
            continue
        set_type = "train" if i < n_train else "test"
        out_dir = os.path.join(args.output_dir, set_type)
        os.makedirs(out_dir, exist_ok=True)
        cv2.imwrite(os.path.join(out_dir, stem + ".jpg"), img)
        with open(os.path.join(out_dir, stem + ".json"), "w",
                  encoding="utf-8") as f:
            json.dump({"shapes": shapes}, f, ensure_ascii=False)
        n_done += 1
    print(f"converted {n_done}/{len(names)} images "
          f"({n_train} train split)")


if __name__ == "__main__":
    main()
