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
- acquire: O_EXCL-create ``write.lock`` with {pid, pid_start, host,
  ts};
- held by a LIVE process on this host -> LockHeldError immediately
  (no blocking: concurrent writers are a configuration error, not a
  queue). Liveness is pid + /proc start-time, so a recycled pid does
  NOT keep a crashed writer's lock alive forever;
- stale (holder dead on this host, or any foreign-host holder older
  than ``stale_after`` seconds) -> broken and re-acquired. The break
  is an atomic rename-aside: exactly one breaker wins the rename, and
  what was renamed is re-verified before being discarded, so two
  breakers can never each "break" and then trample a freshly
  re-acquired live lock (the classic unlink TOCTOU);
- release only deletes the file if WE still own it.

Caveat, stated plainly: ``stale_after`` must exceed the longest
cross-host build (the lock file is written once, not heartbeated);
same-host liveness does not depend on it.
"""

from __future__ import annotations

import json
import os
import socket
import time

LOCK_NAME = "write.lock"


class LockHeldError(RuntimeError):
    pass


def _proc_starttime(pid: int) -> int | None:
    """Process start time in clock ticks (/proc/<pid>/stat field 22,
    Linux procfs — public interface). None when unavailable."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            stat = f.read()
        # comm (field 2) may contain spaces/parens: split after the
        # LAST ')' per proc(5)
        return int(stat.rsplit(")", 1)[1].split()[19])
    except (OSError, IndexError, ValueError):
        return None


class WriteLock:
    def __init__(self, root: str, stale_after: float = 1800.0):
        self.root = root
        self.path = os.path.join(root, LOCK_NAME)
        self.stale_after = stale_after
        self._held = False

    # ------------------------------------------------------------ api

    def acquire(self) -> "WriteLock":
        os.makedirs(self.root, exist_ok=True)
        for _ in range(8):  # bounded retries through break races
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                info = self._read(self.path)
                if not self._is_stale(info):
                    raise LockHeldError(
                        f"{self.path} held by {info or 'unknown writer'}; "
                        "one writer per index root (Lucene write.lock "
                        "semantics)"
                    )
                # atomic break: exactly ONE breaker wins this rename
                aside = f"{self.path}.breaking.{os.getpid()}.{time.time_ns()}"
                try:
                    os.rename(self.path, aside)
                except FileNotFoundError:
                    continue  # lost the race — re-evaluate whatever is there now
                moved = self._read(aside)
                if moved != info and not self._is_stale(moved):
                    # a NEW live owner appeared between read and rename:
                    # put their lock back. link() refuses to clobber, so
                    # if yet another writer already created a fresh lock
                    # we just drop the aside copy (that owner wins).
                    try:
                        os.link(aside, self.path)
                    except OSError:
                        pass
                    os.unlink(aside)
                    raise LockHeldError(
                        f"{self.path} re-acquired by a live writer during "
                        "stale-lock break"
                    )
                os.unlink(aside)
                continue
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {
                        "pid": os.getpid(),
                        "pid_start": _proc_starttime(os.getpid()),
                        "host": socket.gethostname(),
                        "ts": time.time(),
                    },
                    f,
                )
            self._held = True
            return self
        raise LockHeldError(f"could not break stale lock at {self.path}")

    def release(self) -> None:
        if self._held:
            self._held = False
            owner = self._read(self.path)
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

    def _read(self, path: str) -> dict | None:
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _is_stale(self, info: dict | None) -> bool:
        if info is None:
            # unreadable/corrupt/vanished lock: age decides
            try:
                return time.time() - os.path.getmtime(self.path) > self.stale_after
            except OSError:
                return True
        if info.get("host") == socket.gethostname():
            pid = int(info.get("pid", -1))
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                return True  # holder died without releasing
            except PermissionError:
                pass  # exists, owned by another user — fall through
            except OverflowError:
                return True  # garbage pid
            # pid is alive — but is it the SAME process? A recycled pid
            # must not keep a crashed writer's lock alive forever.
            recorded = info.get("pid_start")
            if recorded is not None:
                current = _proc_starttime(pid)
                if current is not None and current != recorded:
                    return True  # different process wearing the old pid
            return False
        return time.time() - float(info.get("ts", 0)) > self.stale_after
