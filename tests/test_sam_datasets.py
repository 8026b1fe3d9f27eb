"""SAM / SAM2 composite dataset machinery over synthetic on-disk fixtures:
multi-source mixing with per-source caps, per-image mask caps, json/RLE
masks, image-as-1-frame video mixing, per-frame prompt synthesis with all
three prompt types, and the cond/iter frame flags through a collated
batch (reference sam_segmentation_dataset.py:19-464,
sam2_video_segmentation_dataset.py:28-1451)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sam_fixture(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("sam_data")
    rs = np.random.RandomState(0)

    # source A: png-per-mask layout, 3 images x 2 masks
    a = root / "setA" / "train"
    a.mkdir(parents=True)
    for i in range(3):
        img = (rs.rand(64, 80, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(a / f"im{i}.jpg"), img)
        for k in range(2):
            m = np.zeros((64, 80), np.uint8)
            m[10 + k * 5:40, 20:60] = 255
            cv2.imwrite(str(a / f"im{i}_mask{k}.png"), m)

    # source B: SA-1B-style json RLE layout, 2 images x 3 anns
    from simpleaicv_pytorch_training_examples_tpu.detection.rle import (
        rle_encode)
    b = root / "setB" / "train"
    b.mkdir(parents=True)
    for i in range(2):
        img = (rs.rand(48, 48, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(b / f"pic{i}.jpg"), img)
        anns = []
        for k in range(3):
            m = np.zeros((48, 48), np.uint8)
            m[5 + k:30, 8:40] = 1
            anns.append({"segmentation": rle_encode(m)})
        with open(b / f"pic{i}.json", "w") as f:
            json.dump({"annotations": anns}, f)
    return str(root)


def test_sam_dataset_multi_source_caps_and_rle(sam_fixture):
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.datasets.sam_segmentation_dataset import (
        SamSegmentationDataset)

    ds = SamSegmentationDataset(
        sam_fixture, set_name_list=["setA", "setB"], set_type="train")
    # one item per (image, mask): 3*2 + 2*3
    assert len(ds) == 12
    s = ds[0]
    assert s["image"].shape == (64, 80, 3) and s["mask"].shape == (64, 80)
    # an RLE-backed item decodes to a binary mask
    s2 = ds[len(ds) - 1]
    assert set(np.unique(s2["mask"])) <= {0.0, 1.0}
    assert s2["mask"].sum() > 0

    # per-source caps: cap source A at 1 image, B at 1 image
    capped = SamSegmentationDataset(
        sam_fixture, set_name_list=["setA", "setB"], set_type="train",
        per_set_image_choose_max_num={"setA": 1, "setB": 1})
    assert len(capped) == 2 + 3
    # per-image mask cap
    capped2 = SamSegmentationDataset(
        sam_fixture, set_name_list=["setB"], set_type="train",
        per_image_mask_chosse_max_num=1)
    assert len(capped2) == 2


def test_sam_collater_all_prompt_types(sam_fixture):
    from simpleaicv_pytorch_training_examples_tpu.interactive_segmentation.datasets.sam_segmentation_dataset import (
        SamSegmentationDataset, SAMCollater)

    ds = SamSegmentationDataset(
        sam_fixture, set_name_list=["setA"], set_type="train")
    for probs, field in [((1.0, 0.0, 0.0), "prompt_point"),
                         ((0.0, 1.0, 0.0), "prompt_box_valid"),
                         ((0.0, 0.0, 1.0), "prompt_mask_valid")]:
        coll = SAMCollater(resize=128, n_points=4, prompt_probs=probs)
        batch = coll([ds[i] for i in range(2)])
        assert batch["image"].shape == (2, 128, 128, 3)
        if field == "prompt_point":
            assert (batch["prompt_point"][:, 0, 2] >= 0).all()
        else:
            assert batch[field].sum() == 2.0


@pytest.fixture(scope="module")
def sam2_fixture(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("sam2_data")
    rs = np.random.RandomState(0)

    # video source: 2 videos x 5 frames, 2 objects each
    v = root / "vids" / "train"
    for vid in range(2):
        vdir = v / f"vid{vid}"
        vdir.mkdir(parents=True)
        for f in range(5):
            img = (rs.rand(48, 64, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(vdir / f"{f:05d}.jpg"), img)
            for obj in range(2):
                m = np.zeros((48, 64), np.uint8)
                m[8 + obj * 16:20 + obj * 16, 4 + f * 2:30 + f * 2] = 255
                cv2.imwrite(str(vdir / f"{f:05d}_mask{obj}.png"), m)

    # image source mixed as 1-frame clips
    im = root / "imgs" / "train"
    im.mkdir(parents=True)
    for i in range(3):
        img = (rs.rand(40, 40, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(im / f"im{i}.jpg"), img)
        m = np.zeros((40, 40), np.uint8)
        m[8:30, 8:30] = 255
        cv2.imwrite(str(im / f"im{i}_mask0.png"), m)
    return str(root)


def test_sam2_dataset_mixes_videos_and_images(sam2_fixture):
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.datasets.sam2_video_segmentation_dataset import (
        SAM2VideoSegmentationDataset)

    ds = SAM2VideoSegmentationDataset(
        video_root_dir=sam2_fixture, video_set_name=["vids"],
        image_root_dir=sam2_fixture, image_set_name=["imgs"],
        per_video_choose_object_nums=2, frame_nums=4)
    # 2 videos x 2 objects + 3 images x 1 mask
    assert len(ds) == 7
    s_video = ds[0]
    assert len(s_video["images"]) == 4 and len(s_video["masks"]) == 4
    # moving object: masks differ across frames
    assert (s_video["masks"][0] != s_video["masks"][-1]).any()
    s_image = ds[6]
    # static clip: every frame identical
    np.testing.assert_array_equal(s_image["images"][0],
                                  s_image["images"][-1])
    np.testing.assert_array_equal(s_image["masks"][0],
                                  s_image["masks"][-1])

    # the two objects of one video yield different masks
    a, b = ds.entries[0], ds.entries[1]
    assert a[1] == b[1] and a[3] != b[3]
    assert (ds[0]["masks"][0] != ds[1]["masks"][0]).any()


def test_sam2_batch_collater_cond_and_iter_frames(sam2_fixture):
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.datasets.sam2_video_segmentation_dataset import (
        SAM2VideoBatchCollater, SAM2VideoSegmentationDataset)

    ds = SAM2VideoSegmentationDataset(
        video_root_dir=sam2_fixture, video_set_name=["vids"],
        frame_nums=4)
    np.random.seed(3)
    coll = SAM2VideoBatchCollater(resize=128, frame_nums=4, n_points=2,
                                  prompt_probs=(1.0, 0.0, 0.0),
                                  extra_cond_frames=1,
                                  point_iter_frame_num=1)
    batch = coll([ds[0], ds[1]])
    t = 4
    assert batch["image"].shape == (2, t, 128, 128, 3)
    assert batch["prompt_point"].shape == (2, t, 2, 3)
    cond = batch["is_cond_frame"].max(axis=0)
    iters = batch["is_iter_frame"].max(axis=0)
    assert cond[0] == 1.0
    # iter frames are never condition frames
    assert (cond * iters).sum() == 0.0
    # point prompts exist exactly on condition frames
    has_pts = (batch["prompt_point"][..., 2] >= 0).any(axis=2)  # [B,T]
    for f in range(t):
        if cond[f] > 0:
            assert has_pts[:, f].all()
        else:
            assert not has_pts[:, f].any()

    # box / mask prompt types flow through the same per-frame validity
    for probs, field in [((0.0, 1.0, 0.0), "prompt_box_valid"),
                         ((0.0, 0.0, 1.0), "prompt_mask_valid")]:
        c = SAM2VideoBatchCollater(resize=128, frame_nums=4,
                                   prompt_probs=probs,
                                   extra_cond_frames=0,
                                   point_iter_frame_num=0)
        bb = c([ds[0]])
        assert bb[field][:, 0].sum() == 1.0
        assert bb[field][:, 1:].sum() == 0.0


def test_sam2_video_matting_background_composites(sam2_fixture, tmp_path):
    import cv2
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.datasets.sam2_video_matting_dataset import (
        SAM2VideoMattingDataset)

    rs = np.random.RandomState(2)
    # matting video: frames + alpha mattes
    root = tmp_path / "matting"
    vdir = root / "VideoMatte" / "train" / "clip0"
    vdir.mkdir(parents=True)
    for f in range(4):
        img = np.full((32, 32, 3), 200, np.uint8)  # bright fg plate
        cv2.imwrite(str(vdir / f"{f:05d}.jpg"), img)
        a = np.zeros((32, 32), np.uint8)
        a[8:24, 8:24] = 255
        cv2.imwrite(str(vdir / f"{f:05d}_alpha.png"), a)
    # background videos: dark frames
    broot = tmp_path / "backgrounds"
    bdir = broot / "train" / "bg0"
    bdir.mkdir(parents=True)
    for f in range(6):
        cv2.imwrite(str(bdir / f"{f:05d}.jpg"),
                    np.zeros((16, 16, 3), np.uint8))

    np.random.seed(0)
    ds = SAM2VideoMattingDataset(
        str(root), set_name_list=["VideoMatte"], frame_nums=4,
        background_root_dir=str(broot),
        use_background_video_prob={"VideoMatte": 1.0})
    s = ds[0]
    frame, alpha = s["images"][0], s["alphas"][0]
    # outside the matte: background (dark); inside: foreground (bright)
    assert frame[0, 0].mean() < 50
    assert frame[16, 16].mean() > 150
    assert alpha[16, 16] == 1.0

    # prob 0 -> no compositing, fg plate everywhere
    ds0 = SAM2VideoMattingDataset(
        str(root), set_name_list=["VideoMatte"], frame_nums=4,
        background_root_dir=str(broot),
        use_background_video_prob={"VideoMatte": 0.0})
    assert ds0[0]["images"][0][0, 0].mean() > 150


def test_sam2_matting_batch_collater_flags(tmp_path):
    import cv2
    from simpleaicv_pytorch_training_examples_tpu.video_interactive_segmentation.datasets.sam2_video_matting_dataset import (
        SAM2VideoMattingBatchCollater, SAM2VideoMattingDataset)

    root = tmp_path / "m"
    vdir = root / "vm" / "train" / "c0"
    vdir.mkdir(parents=True)
    for f in range(4):
        cv2.imwrite(str(vdir / f"{f:05d}.jpg"),
                    np.full((32, 32, 3), 150, np.uint8))
        a = np.zeros((32, 32), np.uint8)
        a[8:24, 8:24] = 255
        cv2.imwrite(str(vdir / f"{f:05d}_alpha.png"), a)

    ds = SAM2VideoMattingDataset(str(root), set_name_list=["vm"],
                                 frame_nums=4)
    np.random.seed(1)
    coll = SAM2VideoMattingBatchCollater(resize=64, frame_nums=4,
                                         n_points=2,
                                         prompt_probs=(1.0, 0.0, 0.0),
                                         extra_cond_frames=1)
    batch = coll([ds[0]])
    assert batch["image"].shape == (1, 4, 64, 64, 3)
    assert batch["alpha"].shape == (1, 4, 64, 64)
    assert batch["trimap"].shape == (1, 4, 64, 64)
    assert batch["prompt_point"].shape == (1, 4, 2, 3)
    cond = batch["is_cond_frame"].max(axis=0)
    assert cond[0] == 1.0
    has_pts = (batch["prompt_point"][..., 2] >= 0).any(axis=2)[0]
    for f in range(4):
        assert bool(has_pts[f]) == bool(cond[f] > 0)
