"""Matting quality metrics: Gradient and Connectivity (host-side numpy).

Parity with the reference's human-matting eval
(/root/reference/tools/human_matting_scripts.py:26-173 — IoU/precision/
recall + SAD/MAE/MSE/Grad/Conn): these two are the classic Rhemann et al.
perceptual matting metrics. SAD/MAE/MSE live in the jitted eval step; Grad
and Conn need gaussian-derivative filters and connected components, so
they run here per image on host.
"""

import numpy as np

__all__ = ["gradient_error", "connectivity_error"]


def _gaussian_kernel1d(sigma, order, radius):
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * (x / sigma) ** 2)
    phi = phi / phi.sum()
    if order == 0:
        return phi
    # first derivative of the gaussian
    return phi * (-x / (sigma ** 2))


def _gauss_gradient(img, sigma=1.4):
    """Gradient magnitude via separable derivative-of-gaussian filters."""
    import cv2
    radius = int(3 * sigma + 0.5)
    g = _gaussian_kernel1d(sigma, 0, radius)[None]
    dg = _gaussian_kernel1d(sigma, 1, radius)[None]
    img = img.astype(np.float64)
    gx = cv2.sepFilter2D(img, -1, dg.T.astype(np.float64),
                         g.astype(np.float64).ravel())
    gy = cv2.sepFilter2D(img, -1, g.T.astype(np.float64),
                         dg.astype(np.float64).ravel())
    return np.hypot(gx, gy)


def gradient_error(pred, gt, sigma=1.4, scale=1000.0):
    """Sum of squared gradient-magnitude differences / scale.
    pred/gt [H,W] alphas in [0,1]."""
    amp_p = _gauss_gradient(pred, sigma)
    amp_g = _gauss_gradient(gt, sigma)
    return float(((amp_p - amp_g) ** 2).sum() / scale)


def connectivity_error(pred, gt, step=0.1, theta=0.15, scale=1000.0):
    """Rhemann connectivity: per pixel, the highest threshold at which it
    stays connected to the largest jointly-foreground component; the
    degradation beyond `theta` is penalized. pred/gt [H,W] in [0,1]."""
    import cv2
    pred = pred.astype(np.float64)
    gt = gt.astype(np.float64)
    thresh_steps = np.arange(0.0, 1.0 + step, step)
    l_map = np.full(pred.shape, -1.0)
    for i in range(1, len(thresh_steps)):
        t = thresh_steps[i]
        inter = ((pred >= t) & (gt >= t)).astype(np.uint8)
        n, labels = cv2.connectedComponents(inter, connectivity=4)
        if n > 1:
            sizes = np.bincount(labels.ravel())
            sizes[0] = 0
            omega = labels == sizes.argmax()
        else:
            omega = np.zeros(pred.shape, bool)
        flag = (l_map == -1) & (~omega)
        l_map[flag] = thresh_steps[i - 1]
    l_map[l_map == -1] = 1.0

    pred_d = pred - l_map
    gt_d = gt - l_map
    pred_phi = 1.0 - pred_d * (pred_d >= theta)
    gt_phi = 1.0 - gt_d * (gt_d >= theta)
    return float(np.abs(pred_phi - gt_phi).sum() / scale)
