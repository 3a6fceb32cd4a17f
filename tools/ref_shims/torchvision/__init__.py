"""Minimal torchvision stand-in for running the REFERENCE on this rig.

The image lacks torchvision (no CUDA wheel set), but the reference
(`/root/reference`) imports it in two places on its live path:

  * ``torchvision.ops.nms`` inside ``non_max_suppression``
    (basics/utils/general.py:496)
  * ``from torchvision import transforms`` -> ``transforms.ToPILImage()``
    (basics/test.py:20-22, used for debug image dumps)

This shim provides exactly those two entry points in pure torch/PIL so the
reference can be executed as the *training-parity oracle* (tools/ref_ab.py).
It is a test fixture for OUR harness, not part of the framework.
"""

from . import ops, transforms  # noqa: F401

__version__ = "0.0-sodt-shim"
