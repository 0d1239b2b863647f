"""Single-writer write.lock (Lucene parity; index/lock.py).

Lucene's IndexWriter takes an exclusive write.lock per index
directory; the reference holds one writer per workspace on top of it
(Services/LuceneIndexService.cs context). Spark builds are
driver-coordinated, so the driver-side advisory lock is the correct
scope. Pinned here: mutual exclusion, crash recovery (dead-pid locks
break so resume works), ownership-checked release, and the build
path actually taking it.
"""

import json
import os
import subprocess
import sys
import time

import pytest

from coa_codesearch_mcp_spark.index.lock import LOCK_NAME, LockHeldError, WriteLock


def test_exclusive_within_process(tmp_path):
    root = str(tmp_path / "ix")
    with WriteLock(root):
        with pytest.raises(LockHeldError):
            WriteLock(root).acquire()
    # released -> acquirable again
    WriteLock(root).acquire().release()


def test_exclusive_against_live_other_process(tmp_path):
    root = str(tmp_path / "ix")
    os.makedirs(root)
    # a LIVE process on this host holds the lock
    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(30)"])
    try:
        with open(os.path.join(root, LOCK_NAME), "w") as f:
            json.dump({"pid": child.pid, "host": __import__("socket").gethostname(),
                       "ts": time.time()}, f)
        with pytest.raises(LockHeldError):
            WriteLock(root).acquire()
    finally:
        child.kill()
        child.wait()


def test_stale_dead_pid_lock_is_broken(tmp_path):
    root = str(tmp_path / "ix")
    os.makedirs(root)
    child = subprocess.Popen([sys.executable, "-c", "pass"])
    child.wait()  # pid now dead
    with open(os.path.join(root, LOCK_NAME), "w") as f:
        json.dump({"pid": child.pid, "host": __import__("socket").gethostname(),
                   "ts": time.time()}, f)
    lk = WriteLock(root).acquire()  # crashed writer's lock breaks
    assert json.load(open(lk.path))["pid"] == os.getpid()
    lk.release()


def test_foreign_host_lock_honored_until_stale(tmp_path):
    root = str(tmp_path / "ix")
    os.makedirs(root)
    with open(os.path.join(root, LOCK_NAME), "w") as f:
        json.dump({"pid": 1, "host": "other-driver", "ts": time.time()}, f)
    with pytest.raises(LockHeldError):
        WriteLock(root).acquire()
    # same holder, but past the staleness horizon -> reclaimed
    with open(os.path.join(root, LOCK_NAME), "w") as f:
        json.dump({"pid": 1, "host": "other-driver", "ts": time.time() - 9999}, f)
    WriteLock(root, stale_after=1800).acquire().release()


def test_release_does_not_remove_foreign_lock(tmp_path):
    root = str(tmp_path / "ix")
    lk = WriteLock(root).acquire()
    # another writer broke in (e.g. we were declared stale) — release
    # must not delete THEIR lock
    with open(lk.path, "w") as f:
        json.dump({"pid": 999999, "host": "other", "ts": time.time()}, f)
    lk.release()
    assert os.path.exists(lk.path)


def test_index_build_takes_and_releases_lock(spark, tmp_path):
    from coa_codesearch_mcp_spark.fixtures.webgen import generate_webpages
    from coa_codesearch_mcp_spark.index.store import IndexConfig, IndexWriter

    root = str(tmp_path / "ix_locked")
    docs = generate_webpages(spark, 100, partitions=2).withColumn(
        "doc_id", __import__("pyspark.sql.functions", fromlist=["F"]).monotonically_increasing_id()
    )
    cfg = IndexConfig(field="content", n_buckets=2, range_size=1 << 14,
                      chunk_size=1 << 14)
    w = IndexWriter(spark, root, cfg)
    # a live concurrent writer blocks the build before any work
    with WriteLock(root):
        with pytest.raises(LockHeldError):
            w.build(docs)
    w.build(docs)
    assert not os.path.exists(os.path.join(root, LOCK_NAME))


def test_recycled_pid_lock_is_stale(tmp_path):
    """A crashed writer whose pid was recycled to an unrelated live
    process must not hold the lock forever: /proc start-time identity
    distinguishes the current pid holder from the recorded one."""
    root = str(tmp_path / "ix")
    os.makedirs(root)
    with open(os.path.join(root, LOCK_NAME), "w") as f:
        json.dump(
            {
                "pid": os.getpid(),            # a live pid...
                "pid_start": 12345,            # ...recorded by a DIFFERENT process
                "host": __import__("socket").gethostname(),
                "ts": time.time(),
            },
            f,
        )
    lk = WriteLock(root).acquire()
    assert json.load(open(lk.path))["pid"] == os.getpid()
    lk.release()


def test_break_race_single_winner(tmp_path):
    """Two breakers racing a stale lock: exactly one acquires; the
    loser either acquires after release or raises — never both holding
    simultaneously (rename-aside break, not check-then-unlink)."""
    import threading

    root = str(tmp_path / "ix")
    os.makedirs(root)
    child = subprocess.Popen([sys.executable, "-c", "pass"])
    child.wait()
    with open(os.path.join(root, LOCK_NAME), "w") as f:
        json.dump({"pid": child.pid, "host": __import__("socket").gethostname(),
                   "ts": time.time()}, f)

    held = []
    lock_holders = []
    barrier = threading.Barrier(2)

    def contend(name):
        barrier.wait()
        try:
            lk = WriteLock(root).acquire()
            held.append(name)
            lock_holders.append(json.load(open(lk.path))["pid"])
            time.sleep(0.05)
            assert held == [name], f"concurrent holders: {held}"
            held.remove(name)
            lk.release()
        except LockHeldError:
            pass

    ts = [threading.Thread(target=contend, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert lock_holders, "at least one contender must have acquired"
