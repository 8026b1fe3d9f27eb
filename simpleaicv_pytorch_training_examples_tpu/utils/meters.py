"""Host-side metric meters.

Parity with /root/reference/SimpleAICV/classification/common.py:668-757
(AverageMeter / AccMeter / SemanticSoftmaxMeter). These accumulate python
scalars; on-device accumulation happens inside jitted eval steps and is
reduced before feeding these.
"""


class AverageMeter:

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class AccMeter:
    """Top-1 / top-k correct-count accumulator."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.correct_num = 0
        self.topk_correct_num = 0
        self.sample_num = 0

    def update(self, correct, topk_correct, n):
        self.correct_num += int(correct)
        self.topk_correct_num += int(topk_correct)
        self.sample_num += int(n)

    @property
    def acc1(self):
        return self.correct_num / max(self.sample_num, 1) * 100.0

    @property
    def acc_topk(self):
        return self.topk_correct_num / max(self.sample_num, 1) * 100.0


class SemanticSoftmaxMeter:
    """ImageNet-21K hierarchical semantic-accuracy accumulator."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.weighted_correct = 0.0
        self.weighted_total = 0.0

    def update(self, weighted_correct, weighted_total):
        self.weighted_correct += float(weighted_correct)
        self.weighted_total += float(weighted_total)

    @property
    def semantic_acc(self):
        return self.weighted_correct / max(self.weighted_total, 1e-8) * 100.0


class SalientObjectDetectionMeter:
    """256-threshold tp/fp/fn accumulator -> precision/recall/F-beta^2 +
    mean IoU at 0.5 (reference tools/salient_object_detection_scripts.py:
    24-90 EvalMeter; used by engine/evaluators.py
    salient_object_detection_evaluator and unit-tested directly)."""

    def __init__(self, thresholds=256, beta2=0.3):
        import numpy as np
        self.n_thresh = thresholds
        self.beta2 = beta2
        self.tp = np.zeros(thresholds)
        self.fp = np.zeros(thresholds)
        self.fn = np.zeros(thresholds)
        self.ious = []

    def update(self, preds, gts):
        """preds/gts [B, H, W] float (pred in [0,1], gt {0,1})."""
        import numpy as np
        thr = np.linspace(0.0, 1.0 - 1e-4, self.n_thresh)
        p = preds.reshape(preds.shape[0], -1).astype(np.float32)
        g = (gts.reshape(gts.shape[0], -1) > 0.5).astype(np.float32)
        bin_p = (p[None] > thr[:, None, None]).astype(np.float32)
        self.tp += (bin_p * g[None]).sum(axis=(1, 2))
        self.fp += (bin_p * (1 - g[None])).sum(axis=(1, 2))
        self.fn += ((1 - bin_p) * g[None]).sum(axis=(1, 2))
        b05 = (p > 0.5).astype(np.float32)
        inter = (b05 * g).sum(axis=1)
        union = np.clip(b05.sum(axis=1) + g.sum(axis=1) - inter, 1e-4,
                        None)
        self.ious.extend((inter / union).tolist())

    def add_sums(self, tp, fp, fn, ious):
        """Accumulate device-computed per-threshold sums (the evaluator's
        jitted path)."""
        import numpy as np
        self.tp += np.asarray(tp)
        self.fp += np.asarray(fp)
        self.fn += np.asarray(fn)
        self.ious.extend(ious)

    def summary(self):
        import numpy as np
        precision = self.tp / np.clip(self.tp + self.fp, 1, None)
        recall = self.tp / np.clip(self.tp + self.fn, 1, None)
        f_beta = (1 + self.beta2) * precision * recall / np.clip(
            self.beta2 * precision + recall, 1e-8, None)
        return {
            "miou": float(np.mean(self.ious)) if self.ious else 0.0,
            "max_f_beta": float(f_beta.max()),
            "precision": float(precision.mean()),
            "recall": float(recall.mean()),
        }
