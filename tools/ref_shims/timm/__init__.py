"""timm stand-in (same surface the test-suite shim provides,
tests/test_torch_parity.py:20-52): the reference only imports DropPath /
to_2tuple / trunc_normal_ from timm.models.layers (common.py:19,
backbone_vit.py:8)."""
from . import models  # noqa: F401
