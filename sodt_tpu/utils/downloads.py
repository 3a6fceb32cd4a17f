"""Weight auto-download (reference basics/utils/google_utils.py:16-58).

The reference's ``attempt_download`` resolves a missing ``--weights`` file by
downloading a matching GitHub release asset. The TPU framework keeps the same
CLI contract — a weights argument that does not exist on disk is fetched
before loading — but with a plain stdlib ``urllib`` fetch (no requests /
torch.hub dependency) and an explicit URL source: either a direct URL
argument, or ``SODT_WEIGHTS_BASE`` (a base URL the file name is joined to).
Air-gapped rigs (like this one) simply never set the env var and pass local
paths; ``file://`` URLs are supported for offline tests.
"""

from __future__ import annotations

import os
import urllib.parse
import urllib.request
from pathlib import Path

__all__ = ["attempt_download"]


def _fetch(url: str, dst: Path, min_bytes: int) -> None:
    # per-process tmp name: concurrent fetchers (every process of a
    # multi-host run resolves --weights) must not interleave writes into
    # one .part file; each downloads fully, the atomic replace races
    # harmlessly (same content)
    tmp = dst.with_suffix(dst.suffix + f".{os.getpid()}.part")
    try:
        print(f"Downloading {url} to {dst}...")
        urllib.request.urlretrieve(url, tmp)  # noqa: S310 - explicit opt-in
        if tmp.stat().st_size < min_bytes:
            raise OSError(f"downloaded file too small "
                          f"({tmp.stat().st_size} B < {min_bytes} B)")
        tmp.replace(dst)
    finally:
        tmp.unlink(missing_ok=True)  # drop partial downloads (ref :50-52)


def attempt_download(weights: str, url: str | None = None,
                     min_bytes: int = 100_000) -> str:
    """Return a local path for ``weights``, downloading it if missing.

    Resolution order when the path does not exist:
      1. ``weights`` itself is a URL -> fetched into the current directory.
      2. explicit ``url`` argument -> fetched to ``weights``.
      3. ``SODT_WEIGHTS_BASE`` env var -> ``<base>/<name>`` fetched to
         ``weights``.
    Otherwise the path is returned unchanged (the checkpoint loader will
    raise its usual clear error).
    """
    s = str(weights).strip()
    if urllib.parse.urlparse(s).scheme in ("http", "https", "file"):
        # cache under a URL-keyed directory, NOT the bare basename in the
        # CWD: two URLs ending in "best" must not collide, and the result
        # must not depend on where the CLI was launched from
        import hashlib
        name = Path(urllib.parse.urlparse(s).path).name or "weights.ckpt"
        cache = Path(os.environ.get(
            "SODT_WEIGHTS_CACHE",
            Path.home() / ".cache" / "sodt_tpu" / "weights"))
        dst = cache / hashlib.sha256(s.encode()).hexdigest()[:16] / name
        # an existing cache entry below the size gate is a poisoned fetch
        # (e.g. a 200-OK HTML error page cached by an older, laxer gate):
        # drop it and refetch rather than loading it forever
        if dst.exists() and dst.stat().st_size < min_bytes:
            dst.unlink()
        if not dst.exists():
            dst.parent.mkdir(parents=True, exist_ok=True)
            _fetch(s, dst, min_bytes)
        return str(dst)
    path = Path(s)
    if path.exists() or not s:
        return s
    src = url or (urllib.parse.urljoin(
        os.environ["SODT_WEIGHTS_BASE"].rstrip("/") + "/", path.name)
        if os.environ.get("SODT_WEIGHTS_BASE") else None)
    if src:
        path.parent.mkdir(parents=True, exist_ok=True)
        _fetch(src, path, min_bytes)
    return s
