"""Single-writer lock per index root (Lucene ``write.lock`` parity).

Lucene's IndexWriter takes an exclusive ``write.lock`` in the index
directory so two writers can never interleave segment files; the
reference holds one writer per workspace for the same reason
(Services/LuceneIndexService.cs: single IndexWriter instance per
workspace, Lucene.NET enforcing write.lock underneath). Spark builds
are DRIVER-coordinated — every manifest commit and wave plan runs on
the driver — so a driver-side advisory lock is the correct scope; on
a multi-driver deployment the coordination point would be the table
catalog (Iceberg commits are optimistic-concurrency on the metadata
pointer), which the manifest's atomic tmp+rename commit stands in
for.

Semantics:
- acquire: O_EXCL-create ``write.lock`` with {pid, host, ts};
- held by a LIVE process on this host -> LockHeldError immediately
  (no blocking: concurrent writers are a configuration error, not a
  queue);
- stale (holder pid dead on this host, or any holder older than
  ``stale_after`` seconds — covers crashed drivers on other hosts) ->
  broken and re-acquired;
- release only deletes the file if WE still own it.
"""

from __future__ import annotations

import json
import os
import socket
import time

LOCK_NAME = "write.lock"


class LockHeldError(RuntimeError):
    pass


class WriteLock:
    def __init__(self, root: str, stale_after: float = 1800.0):
        self.root = root
        self.path = os.path.join(root, LOCK_NAME)
        self.stale_after = stale_after
        self._held = False

    # ------------------------------------------------------------ api

    def acquire(self) -> "WriteLock":
        os.makedirs(self.root, exist_ok=True)
        for _ in range(2):  # second try after breaking a stale lock
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                if self._is_stale():
                    try:
                        os.unlink(self.path)
                    except FileNotFoundError:
                        pass
                    continue
                raise LockHeldError(
                    f"{self.path} held by {self._read() or 'unknown writer'}; "
                    "one writer per index root (Lucene write.lock semantics)"
                )
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {"pid": os.getpid(), "host": socket.gethostname(),
                     "ts": time.time()},
                    f,
                )
            self._held = True
            return self
        raise LockHeldError(f"could not break stale lock at {self.path}")

    def release(self) -> None:
        if self._held:
            self._held = False
            owner = self._read()
            if owner and owner.get("pid") == os.getpid():
                try:
                    os.unlink(self.path)
                except FileNotFoundError:
                    pass

    def __enter__(self) -> "WriteLock":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()

    # ------------------------------------------------------- internal

    def _read(self) -> dict | None:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _is_stale(self) -> bool:
        info = self._read()
        if info is None:
            # unreadable/corrupt lock: age decides
            try:
                return time.time() - os.path.getmtime(self.path) > self.stale_after
            except OSError:
                return True  # vanished concurrently
        if info.get("host") == socket.gethostname():
            pid = int(info.get("pid", -1))
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                return True  # holder died without releasing
            except PermissionError:
                return False  # exists, owned by another user
            except OverflowError:
                return True  # garbage pid
            return False  # alive on this host
        return time.time() - float(info.get("ts", 0)) > self.stale_after
