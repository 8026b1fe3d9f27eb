"""Objects365 annotation filter.

Parity with /root/reference/SimpleAICV/detection/dataset_preprocessing/
001.filter_objects365_dataset.py: drop annotations with degenerate boxes
(w/h below a pixel threshold), the iscrowd set, and images left with no
annotations; write a cleaned COCO-format json.
"""

import argparse
import json


def main():
    p = argparse.ArgumentParser(description="filter objects365 annotations")
    p.add_argument("--input-json", required=True)
    p.add_argument("--output-json", required=True)
    p.add_argument("--min-size", type=float, default=1.0)
    args = p.parse_args()

    with open(args.input_json, encoding="utf-8") as f:
        data = json.load(f)

    kept = []
    for a in data["annotations"]:
        if a.get("iscrowd", 0):
            continue
        w, h = a["bbox"][2], a["bbox"][3]
        if w < args.min_size or h < args.min_size:
            continue
        kept.append(a)
    image_ids = {a["image_id"] for a in kept}
    images = [im for im in data["images"] if im["id"] in image_ids]
    out = {"images": images, "annotations": kept,
           "categories": data["categories"]}
    with open(args.output_json, "w", encoding="utf-8") as f:
        json.dump(out, f)
    print(f"kept {len(kept)}/{len(data['annotations'])} annotations, "
          f"{len(images)}/{len(data['images'])} images")


if __name__ == "__main__":
    main()
