"""ImageNet-21K(-P) dataset with semantic-tree hierarchical labels.

Parity with /root/reference/SimpleAICV/classification/datasets/
imagenet21kdataset.py (584 LoC): folder-per-class images plus the MIIL
semantic tree (imagenet21k_miil_tree.pth: class_tree_list = per-class
ancestor chains, class_list = wnid order). Exposes the same conversion API
consumed by SemanticSoftmaxLoss:
- normalization_factor_list: per-hierarchy weights (#classes proportional);
- convert_outputs_to_semantic_outputs(logits) -> per-hierarchy logit lists;
- convert_single_labels_to_semantic_labels(labels) -> [B, n_hierarchies]
  (-1 for levels a class does not reach).
"""

import os

import numpy as np


class ImageNet21KSemanticTreeLabelDataset:

    def __init__(self, root_dir, set_name="train", transform=None,
                 tree_path=None):
        self.transform = transform
        set_dir = os.path.join(root_dir, set_name)
        class_names = sorted(os.listdir(set_dir)) if os.path.isdir(
            set_dir) else []
        self.class_to_idx = {c: i for i, c in enumerate(class_names)}
        self.image_paths, self.labels = [], []
        for cls in class_names:
            cls_dir = os.path.join(set_dir, cls)
            if not os.path.isdir(cls_dir):
                continue
            for name in sorted(os.listdir(cls_dir)):
                self.image_paths.append(os.path.join(cls_dir, name))
                self.labels.append(self.class_to_idx[cls])
        self.labels = np.asarray(self.labels, dtype=np.int64)

        tree_path = tree_path or os.path.join(root_dir,
                                              "imagenet21k_miil_tree.pth")
        self._build_tree(tree_path)

    def _build_tree(self, tree_path):
        if os.path.exists(tree_path):
            import torch
            tree = torch.load(tree_path, map_location="cpu",
                              weights_only=False)
            class_tree_list = tree["class_tree_list"]
        else:
            # degenerate single-level tree (keeps the API usable without
            # the MIIL tree file)
            n = max(len(self.class_to_idx), 1)
            class_tree_list = [[i] for i in range(n)]

        self.class_tree_list = class_tree_list
        num_classes = len(class_tree_list)
        self.max_hierarchy = max(len(t) for t in class_tree_list)

        # per hierarchy level: the set of classes that exist at that depth
        self.hierarchy_class_lists = []
        self.hierarchy_index_maps = []
        for level in range(self.max_hierarchy):
            classes = sorted({t[level] for t in class_tree_list
                              if len(t) > level})
            self.hierarchy_class_lists.append(np.asarray(classes,
                                                         np.int64))
            self.hierarchy_index_maps.append(
                {c: i for i, c in enumerate(classes)})

        # normalization factors proportional to level sizes
        sizes = np.asarray([len(c) for c in self.hierarchy_class_lists],
                           np.float64)
        self.normalization_factor_list = (sizes / sizes.sum()).tolist()

        # label conversion table [num_classes, max_hierarchy]
        table = np.full((num_classes, self.max_hierarchy), -1, np.int64)
        for cls, ancestors in enumerate(class_tree_list):
            for level, anc in enumerate(ancestors):
                table[cls, level] = self.hierarchy_index_maps[level][anc]
        self.semantic_label_table = table

    def convert_single_labels_to_semantic_labels(self, labels):
        labels = np.asarray(labels, np.int64)
        return self.semantic_label_table[labels]

    def convert_outputs_to_semantic_outputs(self, outputs):
        """outputs [B, num_classes] -> list of per-level [B, C_level]."""
        return [outputs[:, classes]
                for classes in self.hierarchy_class_lists]

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, idx):
        # native libjpeg decode (GIL-free, DCT prescale) with cv2 fallback
        # for non-JPEG files — same hot path as ilsvrc2012dataset.py:42
        from ...data.native_jpeg import decode_jpeg
        image = decode_jpeg(self.image_paths[idx])
        if image is None:
            import cv2
            data = np.fromfile(self.image_paths[idx], dtype=np.uint8)
            image = cv2.cvtColor(cv2.imdecode(data, cv2.IMREAD_COLOR),
                                 cv2.COLOR_BGR2RGB)
        sample = {"image": image.astype(np.float32),
                  "label": int(self.labels[idx])}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
