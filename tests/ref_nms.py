"""Pure-numpy oracle port of the reference non_max_suppression.

Faithful transcription of /root/reference/basics/utils/general.py:425-512
(conf gating, multi-label expansion, class-offset NMS, merge-NMS with the
`1 < n < 3E3` gate and the `i[iou.sum(1) > 1]` redundancy requirement) so
the golden tests run in environments without torchvision. Greedy NMS
replicates torchvision.ops.nms semantics: descending-score order, suppress
IoU strictly greater than the threshold.
"""

import numpy as np


def xywh2xyxy_np(x):
    y = np.copy(x)
    y[:, 0] = x[:, 0] - x[:, 2] / 2
    y[:, 1] = x[:, 1] - x[:, 3] / 2
    y[:, 2] = x[:, 0] + x[:, 2] / 2
    y[:, 3] = x[:, 1] + x[:, 3] / 2
    return y


def box_iou_np(a, b):
    """(N,4) x (M,4) xyxy -> (N,M) IoU (general.py:392-422 semantics)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-16)


def greedy_nms_np(boxes, scores, iou_thres):
    """torchvision.ops.nms semantics in numpy: returns kept indices in
    descending-score order; suppresses IoU > iou_thres."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    alive = np.ones(len(boxes), bool)
    for idx in order:
        if not alive[idx]:
            continue
        keep.append(idx)
        iou = box_iou_np(boxes[idx:idx + 1], boxes)[0]
        alive &= ~(iou > iou_thres)
    return np.asarray(keep, np.int64)


def ref_nms_numpy(prediction, conf_thres=0.25, iou_thres=0.45,
                  agnostic=False, multi_label=False, merge=True,
                  max_det=300, max_nms=30000):
    """Reference pipeline general.py:425-512: list of (n,6) xyxy+conf+cls."""
    prediction = np.asarray(prediction, np.float64)
    nc = prediction.shape[2] - 5
    xc = prediction[..., 4] > conf_thres  # candidates (general.py:433)
    max_wh = 4096
    redundant = True
    multi_label &= nc > 1
    output = []
    for xi in range(prediction.shape[0]):
        x = prediction[xi][xc[xi]]
        if not x.shape[0]:
            output.append(np.zeros((0, 6)))
            continue
        x = x.copy()
        x[:, 5:] *= x[:, 4:5]  # conf = obj * cls (general.py:465)
        box = xywh2xyxy_np(x[:, :4])
        if multi_label:
            i, j = np.nonzero(x[:, 5:] > conf_thres)
            x = np.concatenate(
                (box[i], x[i, j + 5][:, None], j[:, None].astype(np.float64)),
                axis=1)
        else:
            conf = x[:, 5:].max(1, keepdims=True)
            j = x[:, 5:].argmax(1)[:, None]
            x = np.concatenate((box, conf, j.astype(np.float64)),
                               axis=1)[conf.ravel() > conf_thres]
        n = x.shape[0]
        if not n:
            output.append(np.zeros((0, 6)))
            continue
        if n > max_nms:  # excess boxes, sort by confidence (general.py:490)
            x = x[np.argsort(-x[:, 4], kind="stable")[:max_nms]]
        c = x[:, 5:6] * (0 if agnostic else max_wh)
        boxes, scores = x[:, :4] + c, x[:, 4]
        i = greedy_nms_np(boxes, scores, iou_thres)
        if i.shape[0] > max_det:
            i = i[:max_det]
        if merge and (1 < n < 3e3):  # general.py:499-506
            iou = box_iou_np(boxes[i], boxes) > iou_thres
            weights = iou * scores[None]
            x[i, :4] = (weights @ x[:, :4]) / weights.sum(1, keepdims=True)
            if redundant:
                i = i[iou.sum(1) > 1]  # require redundancy
        output.append(x[i])
    return output
