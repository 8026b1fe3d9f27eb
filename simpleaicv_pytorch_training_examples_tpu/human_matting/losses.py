"""Human matting losses.

Parity with /root/reference/SimpleAICV/human_matting/losses.py:21-438:
GlobalTrimapCELoss (BCE on 3-ch sigmoid trimap, pixel trimap values
0/128/255 -> classes 0/1/2), GloabelTrimapIouLoss, LocalAlphaLoss
(charbonnier on the transition region), LocalLaplacianLoss /
FusionLaplacianLoss (5-level gaussian-pyramid L1), FusionAlphaLoss,
CompositionLoss. Preds are NHWC: global_pred [B,H,W,3],
local/fusion preds [B,H,W,1]; alpha/trimap [B,H,W].
"""

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "GlobalTrimapCELoss", "GloabelTrimapIouLoss", "LocalAlphaLoss",
    "LocalLaplacianLoss", "FusionAlphaLoss", "FusionLaplacianLoss",
    "CompositionLoss",
]

_EPS = 1e-4


def _convert_trimap(trimap):
    """pixel trimap 0/128/255 -> classes 0 (bg) / 1 (transition) / 2 (fg)."""
    cls = jnp.where(trimap == 255, 2.0,
                    jnp.where(trimap == 0, 0.0, 1.0))
    return cls.astype(jnp.int32)


class GlobalTrimapCELoss:

    def __call__(self, global_pred, trimap):
        p = jnp.clip(global_pred.astype(jnp.float32), _EPS, 1.0 - _EPS)
        p = p.reshape(-1, 3)
        one_hot = jax.nn.one_hot(_convert_trimap(trimap).reshape(-1), 3,
                                 dtype=jnp.float32)
        bce = -(one_hot * jnp.log(p) + (1.0 - one_hot) * jnp.log(1.0 - p))
        return bce.mean()


class GloabelTrimapIouLoss:

    def __init__(self, smooth=1e-4):
        self.smooth = smooth

    def __call__(self, global_pred, trimap):
        p = jnp.clip(global_pred.astype(jnp.float32), _EPS, 1.0 - _EPS)
        p = p.reshape(-1, 3)
        one_hot = jax.nn.one_hot(_convert_trimap(trimap).reshape(-1), 3,
                                 dtype=jnp.float32)
        inter = p * one_hot
        iou = (inter.sum(axis=1) + self.smooth) / (
            p.sum(axis=1) + one_hot.sum(axis=1) - inter.sum(axis=1) +
            self.smooth)
        return (1.0 - iou).mean()


class LocalAlphaLoss:

    def __call__(self, local_pred, alpha, trimap):
        p = jnp.clip(local_pred.astype(jnp.float32), _EPS, 1.0 - _EPS)
        p = p[..., 0]
        weighted = (trimap == 128).astype(jnp.float32)
        diff = (p - alpha.astype(jnp.float32)) * weighted
        loss = jnp.sqrt(diff**2 + 1e-12)
        return loss.sum() / (weighted.sum() + 1.0)


def _gauss_kernel(size=5, sigma=1.0):
    grid = np.float32(np.mgrid[0:size, 0:size].T)
    gaussian = lambda x: np.exp(-((x - size // 2)**2) / (2 * sigma**2))
    kernel = np.sum(gaussian(grid), axis=2)
    kernel /= np.sum(kernel)
    return kernel.astype(np.float32)


def _conv_gauss(img, kernel):
    """img [B,H,W,1], replicate-pad then depthwise 5x5."""
    k = kernel.shape[0]
    pad = k // 2
    img = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    kern = jnp.asarray(kernel)[:, :, None, None]  # HWIO
    return jax.lax.conv_general_dilated(
        img, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _avg_pool2(img):
    return jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def _laplacian_pyramid(img, kernel, max_levels=5):
    current = img
    pyr = []
    for _ in range(max_levels):
        filtered = _conv_gauss(current, kernel)
        pyr.append(current - filtered)
        current = _avg_pool2(filtered)
    pyr.append(current)
    return pyr


class LocalLaplacianLoss:

    def __init__(self):
        self.kernel = _gauss_kernel(5, 1.0)

    def __call__(self, local_pred, alpha, trimap):
        p = jnp.clip(local_pred.astype(jnp.float32), _EPS, 1.0 - _EPS)
        weighted = (trimap == 128).astype(jnp.float32)[..., None]
        p = p * weighted
        a = alpha.astype(jnp.float32)[..., None] * weighted
        pyr_a = _laplacian_pyramid(a, self.kernel, 5)
        pyr_p = _laplacian_pyramid(p, self.kernel, 5)
        return sum(jnp.abs(x - y).mean() for x, y in zip(pyr_a, pyr_p))


class FusionAlphaLoss:

    def __call__(self, fusion_pred, alpha):
        p = jnp.clip(fusion_pred.astype(jnp.float32), _EPS, 1.0 - _EPS)
        p = p[..., 0]
        diff = p - alpha.astype(jnp.float32)
        loss = jnp.sqrt(diff**2 + 1e-12)
        return loss.sum() / alpha.size


class FusionLaplacianLoss:

    def __init__(self):
        self.kernel = _gauss_kernel(5, 1.0)

    def __call__(self, fusion_pred, alpha):
        p = jnp.clip(fusion_pred.astype(jnp.float32), _EPS, 1.0 - _EPS)
        a = alpha.astype(jnp.float32)[..., None]
        pyr_a = _laplacian_pyramid(a, self.kernel, 5)
        pyr_p = _laplacian_pyramid(p, self.kernel, 5)
        return sum(jnp.abs(x - y).mean() for x, y in zip(pyr_a, pyr_p))


class CompositionLoss:

    def __call__(self, image, alpha, fg_map, bg_map, fusion_pred):
        """image/fg_map/bg_map [B,H,W,3]; alpha [B,H,W];
        fusion_pred [B,H,W,1]."""
        p = jnp.clip(fusion_pred.astype(jnp.float32), _EPS, 1.0 - _EPS)
        composition = p * fg_map + (1.0 - p) * bg_map
        loss = jnp.sqrt((composition - image)**2 + 1e-12)
        return loss.sum() / alpha.size
