"""C++ prefetch loader (native/loader.cpp): decode round-trip and failure
propagation. The reference's python path raises on unreadable images
(datasets.py load_image assert); the native loader must surface the same
condition instead of silently substituting a gray tile."""

import numpy as np
import pytest

from sodt_tpu.data import native_loader

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native loader not built")


def _write_pair(tmp_path, stem, size=32, value=100):
    rgb = np.full((size, size, 3), value, np.uint8)
    ir = np.full((size, size), value + 20, np.uint8)
    rp = tmp_path / f"{stem}_co.png"
    ip = tmp_path / f"{stem}_ir.png"
    cv2.imwrite(str(rp), rgb)
    cv2.imwrite(str(ip), ir)
    return str(rp), str(ip)


def test_decode_roundtrip(tmp_path):
    pairs = [_write_pair(tmp_path, f"t{i}", value=40 * i) for i in range(3)]
    ldr = native_loader.NativeTileLoader(
        [p[0] for p in pairs], [p[1] for p in pairs], img_size=32)
    rgb, ir = ldr.get(np.array([0, 2]))
    assert rgb.shape == (2, 32, 32, 3) and ir.shape == (2, 32, 32, 3)
    assert (rgb[0] == 0).all() and (rgb[1] == 80).all()
    assert (ir[0] == 20).all() and (ir[1] == 100).all()  # 1ch replicated
    ldr.close()


def test_decode_failure_raises(tmp_path):
    """A corrupt/missing file must fail the job with the path in the
    message, not train on a blank tile (ADVICE round 1)."""
    rp, ip = _write_pair(tmp_path, "ok")
    bad = str(tmp_path / "missing_co.png")
    corrupt = tmp_path / "corrupt_ir.png"
    corrupt.write_bytes(b"not a png")
    ldr = native_loader.NativeTileLoader(
        [rp, bad, rp], [ip, ip, str(corrupt)], img_size=32)
    # valid index still works
    rgb, _ = ldr.get(np.array([0]))
    assert rgb.shape == (1, 32, 32, 3)
    with pytest.raises(RuntimeError, match="missing_co.png"):
        ldr.get(np.array([0, 1]))
    with pytest.raises(RuntimeError, match="corrupt_ir.png"):
        ldr.get(np.array([2]))
    ldr.close()
