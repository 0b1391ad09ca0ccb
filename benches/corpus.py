"""Deterministic benchmark corpus.

The reference benches on silesia *dickens* (10,192,446 bytes of English
text; reference benches/utils.rs:4-18 with a FILE env override). That
corpus is not redistributable inside this image and there is no
network egress, so the default corpus here is ~10 MiB of concatenated
Python-stdlib source text -- real, compressible, deterministic text of
comparable entropy. Override with the FILE env var exactly like the
reference harness.
"""

from __future__ import annotations

import os
import sys

TARGET_SIZE = 10_192_446  # match dickens' size for comparability


def corpus_bytes(target: int = TARGET_SIZE) -> bytes:
    """FILE env var wins; else assemble stdlib source text."""
    path = os.environ.get("FILE")
    if path:
        with open(path, "rb") as f:
            return f.read()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "bench_data", f"stdlib_{target}.bin")
    cache = os.path.abspath(cache)
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return f.read()
    root = os.path.dirname(os.__file__)
    parts = []
    size = 0
    for dirpath, dirnames, filenames in sorted(
            (t for t in os.walk(root)), key=lambda t: t[0]):
        dirnames.sort()
        if "site-packages" in dirpath or "__pycache__" in dirpath:
            continue
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            try:
                with open(os.path.join(dirpath, fn), "rb") as f:
                    parts.append(f.read())
            except OSError:
                continue
            size += len(parts[-1])
            if size >= target:
                break
        if size >= target:
            break
    blob = b"".join(parts)[:target]
    if len(blob) < target:  # stdlib smaller than target: tile
        blob = (blob * (target // max(1, len(blob)) + 1))[:target]
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    with open(cache, "wb") as f:
        f.write(blob)
    return blob


if __name__ == "__main__":
    b = corpus_bytes()
    print(f"{len(b)} bytes", file=sys.stderr)
