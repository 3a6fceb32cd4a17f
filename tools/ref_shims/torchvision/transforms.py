"""ToPILImage stand-in (the only transform the reference instantiates)."""

import numpy as np
from PIL import Image


class ToPILImage:
    def __init__(self, mode=None):
        self.mode = mode

    def __call__(self, pic):
        import torch

        if isinstance(pic, torch.Tensor):
            arr = pic.detach().cpu().numpy()
            if arr.ndim == 3:  # CHW -> HWC
                arr = arr.transpose(1, 2, 0)
            if arr.dtype != np.uint8:
                arr = (arr * 255.0).clip(0, 255).astype(np.uint8)
        else:
            arr = np.asarray(pic)
        if arr.ndim == 3 and arr.shape[2] == 1:
            arr = arr[:, :, 0]
        return Image.fromarray(arr, mode=self.mode)
