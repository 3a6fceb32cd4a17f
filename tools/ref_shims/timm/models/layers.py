import torch
import torch.nn as nn


class DropPath(nn.Module):
    """Identity: the reference constructs every block with
    drop_path=0.0 (backbone_vit.py stage ctors), so stochastic depth
    never fires."""

    def __init__(self, p=0.0):
        super().__init__()

    def forward(self, x):
        return x


def to_2tuple(x):
    return x if isinstance(x, tuple) else (x, x)


def trunc_normal_(t, std=1.0, **kw):
    # clamp-after-sample approximation of timm's rejection sampling —
    # init-time only; fine for the A/B (both sides see the same init).
    with torch.no_grad():
        t.normal_(0, std).clamp_(-2 * std, 2 * std)
    return t
