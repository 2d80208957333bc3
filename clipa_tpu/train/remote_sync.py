"""Workdir -> remote storage sync.

Covers the reference's remote-sync machinery
(clipa_torch/training/file_utils.py:10-67: `remote_sync`,
`keep_running_remote_sync`, started from training/main.py:182-197), with
the same shape: a one-shot sync + a background keep-syncing loop driven by
the trainer on the lead process only.

Protocols:
  * plain/`file://` paths — pure-Python recursive copy (mtime+size delta),
  * `gs://` — `gsutil -m rsync -r`,
  * `s3://` — `aws s3 sync`.
CLI tools are invoked via subprocess exactly like the reference (it shells
out to `aws s3 sync` too); no cloud SDK is imported.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import threading
import time
from typing import Optional

EXCLUDE_SUFFIXES = (".tmp", ".lock", "-TEMPORARY")
# In-flight Orbax checkpoint dirs: syncing them would mirror a torn step.
EXCLUDE_DIR_MARKERS = ("orbax-checkpoint-tmp",)


def _sync_local(local_dir: str, remote_dir: str) -> bool:
    remote_dir = remote_dir.removeprefix("file://")
    for root, dirs, files in os.walk(local_dir):
        dirs[:] = [d for d in dirs
                   if not any(m in d for m in EXCLUDE_DIR_MARKERS)]
        rel = os.path.relpath(root, local_dir)
        dst_root = os.path.join(remote_dir, rel) if rel != "." else remote_dir
        os.makedirs(dst_root, exist_ok=True)
        for f in files:
            if f.endswith(EXCLUDE_SUFFIXES):
                continue
            src, dst = os.path.join(root, f), os.path.join(dst_root, f)
            try:
                st = os.stat(src)
                if os.path.exists(dst):
                    dt = os.stat(dst)
                    if dt.st_size == st.st_size and dt.st_mtime >= st.st_mtime:
                        continue
                shutil.copy2(src, dst)
            except OSError as e:
                print(f"remote_sync: failed to copy {src}: {e}")
                return False
    return True


def _sync_cli(cmd: list[str]) -> bool:
    try:
        result = subprocess.run(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE)
    except FileNotFoundError as e:
        print(f"remote_sync: {cmd[0]} not available: {e}")
        return False
    if result.returncode:
        print(f"remote_sync: {' '.join(cmd[:3])} failed: "
              f"{result.stderr.decode(errors='replace')[:500]}")
    return result.returncode == 0


def sync(local_dir: str, remote_dir: str) -> bool:
    """One sync pass; returns success (reference file_utils.py:44-52)."""
    if remote_dir.startswith("s3://"):
        return _sync_cli(["aws", "s3", "sync", local_dir, remote_dir,
                          *_S3_EXCLUDES])
    if remote_dir.startswith("gs://"):
        return _sync_cli(["gsutil", "-m", "rsync", "-r",
                          "-x", _GS_EXCLUDE_RE, local_dir, remote_dir])
    return _sync_local(local_dir, remote_dir)


_GS_EXCLUDE_RE = (r".*orbax-checkpoint-tmp.*|.*-TEMPORARY$"
                  r"|.*\.tmp$|.*\.lock$")
_S3_EXCLUDES = ["--exclude", "*orbax-checkpoint-tmp*",
                "--exclude", "*-TEMPORARY",
                "--exclude", "*.tmp", "--exclude", "*.lock"]


def pull(remote_dir: str, local_dir: str) -> bool:
    """Reverse sync: remote workdir -> local stage, run before resume so
    rule-1 "always resume from the workdir checkpoint"
    (clipa_jax/main.py:404-414) holds across pod restarts with a remote
    workdir. Missing remote (fresh run) is success, not an error."""
    if remote_dir.startswith("s3://"):
        return _sync_cli(["aws", "s3", "sync", remote_dir, local_dir])
    if remote_dir.startswith("gs://"):
        # rsync fails on a nonexistent source bucket path; probe first.
        probe = subprocess.run(["gsutil", "ls", remote_dir],
                               stdout=subprocess.PIPE,
                               stderr=subprocess.PIPE)
        if probe.returncode:
            return True
        os.makedirs(local_dir, exist_ok=True)
        return _sync_cli(["gsutil", "-m", "rsync", "-r",
                          remote_dir, local_dir])
    src = remote_dir.removeprefix("file://")
    if not os.path.isdir(src):
        return True
    os.makedirs(local_dir, exist_ok=True)
    return _sync_local(src, local_dir)


class SyncThread:
    """Background keep-syncing loop (file_utils.py:54-58 equivalent; a
    daemon thread instead of a multiprocessing.Process — the sync is
    subprocess/IO-bound so a thread costs nothing and inherits stdout)."""

    def __init__(self, local_dir: str, remote_dir: str,
                 every_seconds: float = 300.0):
        self.local_dir, self.remote_dir = local_dir, remote_dir
        self.every_seconds = every_seconds
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self):
        def run():
            while not self._stop.wait(self.every_seconds):
                sync(self.local_dir, self.remote_dir)
        self._thread = threading.Thread(target=run, daemon=True,
                                        name="remote-sync")
        self._thread.start()
        return self

    def stop(self, final_sync: bool = True):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
        if final_sync:
            sync(self.local_dir, self.remote_dir)
