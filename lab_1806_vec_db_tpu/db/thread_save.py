"""Background auto-saving.

Parity target: `ThreadSavingManager` (reference: src/database/thread_save.rs):
- a daemon thread wakes every `interval` (condvar with timeout,
  thread_save.rs:47-66) and saves iff the dirty mark is set
- writes are atomic: tmp file then replace (thread_save.rs:11-21; our
  `utils.serde.save_arrays` does tmp + os.replace)
- `sync_save(stop_thread)` flushes on demand and on close
  (thread_save.rs:77-90)
- mutating accessors set the dirty mark (thread_save.rs:109-113)

Lock order mirrors the reference's documented discipline
(thread_save.rs:27): mark -> obj -> stop_cond.
"""

from __future__ import annotations

import threading


class ThreadSavingManager:
    """Wraps an object exposing `save(path)` with periodic dirty-marked
    background saves and an exclusive access lock."""

    def __init__(self, obj, target: str, interval: float, mark: bool):
        self.obj = obj
        self.target = target
        self._obj_lock = threading.RLock()
        self._mark_lock = threading.Lock()
        self._mark = mark
        self._stop = False
        self._stop_cond = threading.Condition(threading.Lock())
        self._thread = threading.Thread(
            target=self._loop, args=(interval,), daemon=True
        )
        self._thread.start()

    def _loop(self, interval: float) -> None:
        while True:
            with self._stop_cond:
                self._stop_cond.wait_for(lambda: self._stop, timeout=interval)
                if self._stop:
                    return
            self._save_if_dirty()

    def _save_if_dirty(self) -> None:
        with self._mark_lock:
            if not self._mark:
                return
            with self._obj_lock:
                self.obj.save(self.target)
            self._mark = False

    def sync_save(self, stop_thread: bool) -> None:
        self._save_if_dirty()
        if stop_thread:
            with self._stop_cond:
                self._stop = True
                self._stop_cond.notify_all()

    # ---- guarded access ----
    def read(self):
        """Context manager for read access."""
        return self._obj_lock

    class _WriteGuard:
        def __init__(self, mgr: "ThreadSavingManager"):
            self.mgr = mgr

        def __enter__(self):
            # lock order mark -> obj, matching _save_if_dirty and the
            # reference's documented discipline (thread_save.rs:27) —
            # acquiring obj first here deadlocks against the saver thread
            mgr = self.mgr
            mgr._mark_lock.acquire()
            try:
                mgr._obj_lock.acquire()
                mgr._mark = True
            finally:
                mgr._mark_lock.release()
            return mgr.obj

        def __exit__(self, *exc):
            self.mgr._obj_lock.release()
            return False

    def write(self) -> "_WriteGuard":
        """Context manager for write access; sets the dirty mark."""
        return self._WriteGuard(self)

    def close(self) -> None:
        self.sync_save(stop_thread=True)
        self._thread.join(timeout=5.0)
