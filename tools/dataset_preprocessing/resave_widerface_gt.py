"""Resave the official WIDERFace eval-tools ground truth (4 MATLAB .mat
files) into one JSON consumed by tools/test_face_detection_model.py.

Parity with /root/reference/10.face_detection_training/widerface_evaluate/
eval_widerface.py:63-78 (get_gt_boxes_from_mat): the official release ships
  wider_face_val.mat   — face_bbx_list / event_list / file_list
  wider_easy_val.mat   — gt_list (per-image 1-based keep indices)
  wider_medium_val.mat — gt_list
  wider_hard_val.mat   — gt_list
The per-difficulty "gt_list" marks which faces count at that difficulty;
unlisted faces are IGNORED (a detection matching one is neither a hit nor a
false positive).

Output JSON: {"<image_stem>": {"event": str, "boxes": [[x1,y1,x2,y2],...],
"easy": [i...], "medium": [i...], "hard": [i...]}} with 0-based keep
indices and xyxy boxes (the mats store xywh).

Usage:
  python resave_widerface_gt.py --gt-dir <dir with the 4 .mat files> \
      --output widerface_val_gt.json
"""

import argparse
import json
import os


def _cell(a):
    """Unwrap scipy.io.loadmat object-array cells to a flat python list."""
    import numpy as np
    out = []
    for item in a:
        while isinstance(item, np.ndarray) and item.ndim and len(item) == 1:
            item = item[0]
        out.append(item)
    return out


def convert_widerface_gt(gt_mat_path, easy_mat_path, medium_mat_path,
                         hard_mat_path):
    """Returns the per-image gt dict (see module docstring)."""
    import numpy as np
    from scipy.io import loadmat

    gt_mat = loadmat(gt_mat_path)
    level_mats = {
        "easy": loadmat(easy_mat_path),
        "medium": loadmat(medium_mat_path),
        "hard": loadmat(hard_mat_path),
    }

    facebox_list = gt_mat["face_bbx_list"]
    event_list = gt_mat["event_list"]
    file_list = gt_mat["file_list"]

    result = {}
    n_events = len(event_list)
    for i in range(n_events):
        event_name = str(_cell(event_list[i])[0])
        images = _cell(file_list[i][0])
        boxes_per_image = _cell(facebox_list[i][0])
        keep_per_level = {
            lvl: _cell(m["gt_list"][i][0]) for lvl, m in level_mats.items()
        }
        for j, stem_arr in enumerate(images):
            stem = str(stem_arr)
            xywh = np.atleast_2d(np.asarray(boxes_per_image[j],
                                            np.float64))
            if xywh.size == 0:
                xyxy = []
            else:
                xyxy = np.concatenate(
                    [xywh[:, :2], xywh[:, :2] + xywh[:, 2:4]],
                    axis=1).tolist()
            entry = {"event": event_name, "boxes": xyxy}
            for lvl in ("easy", "medium", "hard"):
                keep = np.asarray(keep_per_level[lvl][j]).reshape(-1)
                # official lists are 1-based MATLAB indices
                entry[lvl] = sorted(int(k) - 1 for k in keep if k >= 1)
            result[stem] = entry
    return result


def main():
    parser = argparse.ArgumentParser(
        description="resave WIDERFace eval-tools gt mats to json")
    parser.add_argument("--gt-dir", type=str, required=True,
                        help="dir containing wider_face_val.mat + "
                             "wider_{easy,medium,hard}_val.mat")
    parser.add_argument("--output", type=str, required=True)
    args = parser.parse_args()

    result = convert_widerface_gt(
        os.path.join(args.gt_dir, "wider_face_val.mat"),
        os.path.join(args.gt_dir, "wider_easy_val.mat"),
        os.path.join(args.gt_dir, "wider_medium_val.mat"),
        os.path.join(args.gt_dir, "wider_hard_val.mat"))
    with open(args.output, "w") as f:
        json.dump(result, f)
    n_faces = sum(len(v["boxes"]) for v in result.values())
    print(f"wrote {len(result)} images / {n_faces} faces -> {args.output}")


if __name__ == "__main__":
    main()
