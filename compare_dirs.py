"""Unified diff between two directories (checkpoint source snapshots vs the
working tree — the reproducibility tool; reference: src/utils/compare_dirs.py:29-122).

  python compare_dirs.py <dir_a> <dir_b> [--ext .py .json] [--output diff.txt]
"""

import argparse
import difflib
import sys
from pathlib import Path


def compare_dirs(a: Path, b: Path, exts=None):
    files = set()
    for root in (a, b):
        for p in root.rglob("*"):
            if p.is_file() and (exts is None or p.suffix in exts):
                files.add(p.relative_to(root))
    out = []
    for rel in sorted(files):
        pa, pb = a / rel, b / rel
        la = pa.read_text(errors="replace").splitlines(keepends=True) if pa.is_file() else []
        lb = pb.read_text(errors="replace").splitlines(keepends=True) if pb.is_file() else []
        d = list(difflib.unified_diff(la, lb, fromfile=f"a/{rel}", tofile=f"b/{rel}"))
        out.extend(d)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir_a")
    ap.add_argument("dir_b")
    ap.add_argument("--ext", nargs="*", default=[".py", ".json"])
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    diff = compare_dirs(Path(args.dir_a), Path(args.dir_b), set(args.ext) or None)
    text = "".join(diff)
    if args.output:
        Path(args.output).write_text(text)
        print(f"{len(diff)} diff lines -> {args.output}")
    else:
        sys.stdout.write(text)
    sys.exit(1 if diff else 0)


if __name__ == "__main__":
    main()
