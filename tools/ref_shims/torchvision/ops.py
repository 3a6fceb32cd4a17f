"""Pure-torch greedy NMS matching torchvision.ops.nms semantics.

torchvision's contract (vision/torchvision/ops/boxes.py): boxes (N,4) xyxy,
scores (N,), returns indices of kept boxes sorted by decreasing score; a box
is suppressed when IoU with an already-kept higher-scoring box is
STRICTLY GREATER than ``iou_threshold``.
"""

import torch


def _box_iou(box: torch.Tensor, boxes: torch.Tensor) -> torch.Tensor:
    # box (4,), boxes (M,4) xyxy -> (M,)
    tl = torch.maximum(box[:2], boxes[:, :2])
    br = torch.minimum(box[2:], boxes[:, 2:])
    inter = (br - tl).clamp(min=0).prod(dim=1)
    area1 = (box[2:] - box[:2]).clamp(min=0).prod()
    area2 = (boxes[:, 2:] - boxes[:, :2]).clamp(min=0).prod(dim=1)
    return inter / (area1 + area2 - inter).clamp(min=1e-12)


def nms(boxes: torch.Tensor, scores: torch.Tensor,
        iou_threshold: float) -> torch.Tensor:
    if boxes.numel() == 0:
        return torch.empty(0, dtype=torch.long, device=boxes.device)
    order = scores.argsort(descending=True)
    keep = []
    while order.numel() > 0:
        i = order[0]
        keep.append(i)
        if order.numel() == 1:
            break
        rest = order[1:]
        iou = _box_iou(boxes[i], boxes[rest])
        order = rest[iou <= iou_threshold]
    return torch.stack(keep)
