"""Text recognition metrics.

Parity with /root/reference/tools/text_scripts.py:82-893: exact accuracy,
edit distance (the reference uses nltk.edit_distance; plain DP here), and
longest-common-subsequence precision/recall.
"""

__all__ = ["edit_distance", "lcs_length", "lcs_precision_recall"]


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
