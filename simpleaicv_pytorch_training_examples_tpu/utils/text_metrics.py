"""Text recognition metrics.

Parity with /root/reference/tools/text_scripts.py:82-893: exact accuracy,
edit distance (the reference uses nltk.edit_distance; plain DP here),
longest-common-subsequence precision/recall, and the per-category
(digits / latin / GB-standard Chinese level 1/2/3) LCS PR sweep
(text_scripts.py:512-893 test_lcs_PR_for_per_sub_dataset).
"""

__all__ = ["edit_distance", "lcs_length", "lcs_precision_recall",
           "CategoryLCSMeter"]


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance, O(len(a)*len(b)) DP."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def lcs_length(a: str, b: str) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb
                       else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def lcs_precision_recall(pred: str, gt: str):
    l = lcs_length(pred, gt)
    precision = l / len(pred) if pred else (1.0 if not gt else 0.0)
    recall = l / len(gt) if gt else 1.0
    return precision, recall


class CategoryLCSMeter:
    """Global-count LCS precision/recall, overall and per char category.

    Reference semantics (/root/reference/tools/text_scripts.py:512-893):
    per sample, ground-truth chars outside the model's char table become
    the garbage char, spaces are stripped, then for each category the
    pred/target strings are filtered to that category's chars and the LCS
    length is accumulated into global (correct, pred, target) counts;
    precision = c/p, recall = c/t, reported as -1 when the category's
    target count is below `ignore_threshold` (too few chars to be
    meaningful) and 0 when the denominator is empty.
    """

    def __init__(self, categories=None, keep_chars=None,
                 garbage_char="㍿"):
        # categories: {name: iterable of chars}; None -> overall only
        self.categories = {name: set(chars)
                           for name, chars in (categories or {}).items()}
        self.keep_chars = set(keep_chars) if keep_chars is not None else None
        self.garbage_char = garbage_char
        names = ["all"] + list(self.categories)
        self.counts = {name: [0, 0, 0] for name in names}  # c, p, t

    def update(self, pred: str, gt: str):
        if self.keep_chars is not None:
            gt = "".join(ch if ch in self.keep_chars else self.garbage_char
                         for ch in gt)
        pred = pred.replace(" ", "")
        gt = gt.replace(" ", "")
        if gt == "" or gt == self.garbage_char:
            return
        self._accumulate("all", pred, gt)
        for name, chars in self.categories.items():
            self._accumulate(name,
                             "".join(c for c in pred if c in chars),
                             "".join(c for c in gt if c in chars))

    def _accumulate(self, name, pred, gt):
        c = lcs_length(pred, gt) if pred and gt else 0
        counts = self.counts[name]
        counts[0] += c
        counts[1] += len(pred)
        counts[2] += len(gt)

    def results(self, ignore_threshold: int = 1000):
        """{name: (precision%, recall%)}; -1 marks below-threshold rows."""
        out = {}
        for name, (c, p, t) in self.counts.items():
            below = t < ignore_threshold
            precision = 0.0 if p == 0 else (-1.0 if below else c / p * 100.0)
            recall = 0.0 if t == 0 else (-1.0 if below else c / t * 100.0)
            out[name] = (precision, recall)
        return out
