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
