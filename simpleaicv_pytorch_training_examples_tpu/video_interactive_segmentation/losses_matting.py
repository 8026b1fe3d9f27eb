"""SAM2 matting losses (image + video).

Parity with /root/reference/SimpleAICV/video_interactive_segmentation/
losses_matting.py:15-1629 (SAM2MattingLoss / SAM2MattingMultiLevelLoss):
the trimap/alpha loss family applied to the matting triple, per frame for
video inputs. Composition terms are omitted at the video level in the
reference recipe (fg/bg plates only exist for composited image datasets);
the image-level dispatch in the train entry handles them.
"""

import jax.numpy as jnp

from ..human_matting.losses import (FusionAlphaLoss, FusionLaplacianLoss,
                                    GlobalTrimapCELoss,
                                    GloabelTrimapIouLoss, LocalAlphaLoss,
                                    LocalLaplacianLoss)

__all__ = ["SAM2MattingLoss", "SAM2MattingMultiLevelLoss"]


class SAM2MattingLoss:
    """Weighted sum of the matting loss family over (global, local, fused)
    predictions; accepts image ([B,H,W,*]) or video ([B,T,H,W,*]) preds."""

    def __init__(self, global_ce_weight=1.0, global_iou_weight=1.0,
                 local_alpha_weight=1.0, local_laplacian_weight=1.0,
                 fusion_alpha_weight=1.0, fusion_laplacian_weight=1.0):
        self.weights = {
            "global_trimap_ce_loss": global_ce_weight,
            "global_trimap_iou_loss": global_iou_weight,
            "local_alpha_loss": local_alpha_weight,
            "local_laplacian_loss": local_laplacian_weight,
            "fusion_alpha_loss": fusion_alpha_weight,
            "fusion_laplacian_loss": fusion_laplacian_weight,
        }
        self.global_ce = GlobalTrimapCELoss()
        self.global_iou = GloabelTrimapIouLoss()
        self.local_alpha = LocalAlphaLoss()
        self.local_laplacian = LocalLaplacianLoss()
        self.fusion_alpha = FusionAlphaLoss()
        self.fusion_laplacian = FusionLaplacianLoss()

    def _flatten_time(self, x):
        # [B,T,...] -> [B*T,...]; image inputs pass through
        return x.reshape(-1, *x.shape[2:])

    def __call__(self, preds, alpha, trimap):
        """preds: (global, local, fused) image- or video-shaped;
        alpha/trimap match ([B,H,W]/[B,T,H,W])."""
        g, l, f = preds
        if g.ndim == 5:  # video: fold time into batch
            g, l, f = (self._flatten_time(x) for x in (g, l, f))
            alpha = alpha.reshape(-1, *alpha.shape[2:])
            trimap = trimap.reshape(-1, *trimap.shape[2:])
        raw = {
            "global_trimap_ce_loss": self.global_ce(g, trimap),
            "global_trimap_iou_loss": self.global_iou(g, trimap),
            "local_alpha_loss": self.local_alpha(l, alpha, trimap),
            "local_laplacian_loss": self.local_laplacian(l, alpha, trimap),
            "fusion_alpha_loss": self.fusion_alpha(f, alpha),
            "fusion_laplacian_loss": self.fusion_laplacian(f, alpha),
        }
        out = {k: v * self.weights[k] for k, v in raw.items()}
        out["loss"] = sum(out.values(), jnp.float32(0.0))
        return out


class SAM2MattingMultiLevelLoss(SAM2MattingLoss):
    """Supervises ALL mask-level matting outputs (reference
    video_interactive_segmentation/losses_matting.py
    SAM2MattingMultiLevelLoss): when preds carry a level list, the matting
    family losses are computed per level and averaged, instead of
    supervising only the selected level."""

    def __call__(self, preds, alpha, trimap):
        if isinstance(preds[0], (list, tuple)):  # per-level triples
            dicts = [SAM2MattingLoss.__call__(self, p, alpha, trimap)
                     for p in preds]
            inv = 1.0 / len(dicts)
            return {k: sum(d[k] for d in dicts) * inv for k in dicts[0]}
        return SAM2MattingLoss.__call__(self, preds, alpha, trimap)
