"""Experiment provenance: copy the running source tree into the output dir.

Equivalent of the reference's shutil.copytree of its own code into
``output_dir/code`` (train.py:50-51) so every experiment records exactly the
code that produced it.
"""

from __future__ import annotations

import os
import shutil


def snapshot_source(output_dir: str, repo_root: str | None = None) -> str:
    """Copy the framework's Python sources to ``output_dir/code``.

    Copies repo-root ``*.py`` CLIs plus the ``fedfr_tpu`` and
    ``split_dataset`` packages; skips caches, tests, and binaries.  An
    existing snapshot is replaced (re-runs of the same output dir record the
    latest code).
    """
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    dest = os.path.join(output_dir, "code")
    if os.path.exists(dest):
        shutil.rmtree(dest)
    os.makedirs(dest)
    for entry in sorted(os.listdir(repo_root)):
        if entry.endswith(".py"):
            shutil.copy2(os.path.join(repo_root, entry),
                         os.path.join(dest, entry))
    for pkg in ("fedfr_tpu", "split_dataset"):
        src = os.path.join(repo_root, pkg)
        if os.path.isdir(src):
            shutil.copytree(
                src, os.path.join(dest, pkg),
                ignore=shutil.ignore_patterns(
                    "__pycache__", "*.pyc", "*.so", "*.o"))
    return dest
