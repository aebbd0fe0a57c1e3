"""Upload a local dataset tree to a HuggingFace dataset repo (reference
scripts/upload_dataset_to_hf.py): walks the tree, skips files already present
in the repo, uploads the rest with a worker pool. Gated on huggingface_hub
being importable and a login token existing (zero-egress environments print
an explanation and exit cleanly).

Usage:
    python scripts/upload_dataset_to_hf.py --repo-id user/Dataset --local-dir data/... \
        [--repo-type dataset] [--workers 4] [--include '*.laz' ...]
"""

from __future__ import annotations

import argparse
import fnmatch
import os
import sys


def list_files_recursively(base_dir: str, patterns: list[str] | None = None):
    for root, _, files in os.walk(base_dir):
        for f in files:
            rel = os.path.relpath(os.path.join(root, f), base_dir)
            if not patterns or any(fnmatch.fnmatch(rel, p) for p in patterns):
                yield rel


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--repo-id", required=True)
    ap.add_argument("--local-dir", required=True)
    ap.add_argument("--repo-type", default="dataset")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--include", action="append", default=None)
    a = ap.parse_args()

    try:
        from huggingface_hub import HfApi, HfFolder
    except ImportError:
        print("huggingface_hub not installed — cannot upload (offline environment).")
        sys.exit(1)
    api = HfApi()
    if not HfFolder.get_token():
        print("Not logged in: run `huggingface-cli login` first.")
        sys.exit(1)

    existing = set()
    try:
        existing = set(api.list_repo_files(a.repo_id, repo_type=a.repo_type))
    except Exception as e:
        print(f"could not list repo files ({e}); uploading everything")

    todo = [p for p in list_files_recursively(a.local_dir, a.include) if p not in existing]
    print(f"{len(todo)} files to upload ({len(existing)} already present)")

    from concurrent.futures import ThreadPoolExecutor

    def upload(rel: str) -> str:
        api.upload_file(
            path_or_fileobj=os.path.join(a.local_dir, rel),
            path_in_repo=rel,
            repo_id=a.repo_id,
            repo_type=a.repo_type,
        )
        return rel

    with ThreadPoolExecutor(a.workers) as ex:
        for rel in ex.map(upload, todo):
            print(f"uploaded {rel}")


if __name__ == "__main__":
    main()
