"""Cross-process file lock for single-compactor mutual exclusion.

Shared by the sink's compaction entry points and the told-trail's fold/merge
entry points (round-5 ADVICE: ToldTrail had no concurrency control, and the
sink's previous inline lock stole from ALIVE holders after a fixed age and
raced its read-then-remove steal).

Design (each point answers a specific round-5 ADVICE finding):

- **Steal only provably-dead holders.** A parseable lock whose pid probes
  alive is NEVER stolen, regardless of age — a major merge on a large sink
  can legitimately exceed any fixed bound. The age rule applies only to
  locks whose holder cannot be probed (unparseable content, or a pid the
  probe cannot decide), using the file's mtime so even an unparseable lock
  ages out.
- **Holders re-stamp.** ``refresh()`` atomically rewrites the payload with a
  fresh timestamp; long-running holders call it between phases so an
  unprobeable-but-alive holder keeps its lock young.
- **Steal by atomic rename, not remove.** The stealer renames the lock to a
  unique graveyard name and verifies the captured content matches what it
  judged dead. A mismatch means a NEW holder acquired between the read and
  the rename — the capture is restored if the slot is still empty
  (best-effort; the residual window is closed by the sink's fenced marker
  publish, which detects any double-compactor at the commit point).
- **Release only if still ours.** ``release()`` compares pid + a per-acquire
  token before removing, so a holder that WAS stolen from cannot delete the
  thief's lock.

Same-host pid liveness only: ``_pid_alive`` is module-level precisely so a
two-host shared-filesystem deployment (where pid probing lies) can be
simulated in tests — safety there comes from the fenced publish
(sinks._publish_compaction), mirroring how Iceberg's HadoopTableOperations
commits version files atomically rather than trusting locks.
"""

from __future__ import annotations

import json
import os
import time
import uuid


def _pid_alive(pid: int) -> bool | None:
    """True/False when provable; None when the probe cannot decide
    (e.g. a pid owned by another user — EPERM means *something* is there,
    but on a shared filesystem it may be an unrelated process on this
    host while the real holder runs elsewhere)."""
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return None


def _pid_of(info: dict | None) -> int:
    """Pid from an untrusted lock payload; -1 for anything non-numeric
    (a parseable-but-wrongly-typed payload — e.g. {"pid": null} — must be
    treated like garbage, not crash acquire()/refresh() mid-protocol)."""
    try:
        return int(info.get("pid", -1)) if info else -1
    except (TypeError, ValueError):
        return -1


class PidLock:
    """Pid-stamped advisory file lock (atomic O_EXCL create)."""

    def __init__(self, path: str, stale_seconds: float = 3600.0):
        self.path = path
        self.stale_seconds = stale_seconds
        self._token: str | None = None

    # -------------------------------------------------------------- helpers
    def _read(self) -> dict | None:
        try:
            with open(self.path) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None

    def _mtime_age(self) -> float:
        try:
            return time.time() - os.path.getmtime(self.path)
        except OSError:
            return 0.0

    def _payload(self) -> dict:
        return {"pid": os.getpid(), "ts": time.time(), "token": self._token}

    # ---------------------------------------------------------------- steal
    def _try_steal(self, judged: dict | None) -> None:
        """Capture the lock file by atomic rename and verify it is the one
        we judged stealable; restore anything else (a fresh holder's lock
        acquired between our read and the rename, or a mid-write payload)."""
        grave = f"{self.path}.steal-{uuid.uuid4().hex}"
        try:
            os.rename(self.path, grave)
        except FileNotFoundError:
            return  # released/stolen already: the create-retry resolves it
        try:
            with open(grave) as fh:
                got = json.load(fh)
        except (OSError, ValueError):
            got = None
        same = (
            judged is not None
            and got is not None
            and got.get("pid") == judged.get("pid")
            and got.get("ts") == judged.get("ts")
            and got.get("token") == judged.get("token")
        )
        if not same:
            # we captured something we did NOT judge. Re-judge the CAPTURE
            # itself (rename preserves mtime): discard only if it too is
            # provably dead or aged-out garbage — judged-None callers would
            # otherwise yank a fresh holder's lock (or an acquirer's
            # mid-write payload, whose open fd still targets this inode,
            # so restoring it hands the lock back intact).
            if got is not None:
                alive = _pid_alive(_pid_of(got))
                stealable = alive is False
            else:
                try:
                    age = time.time() - os.path.getmtime(grave)
                except OSError:
                    age = 0.0
                stealable = age > self.stale_seconds
            if not stealable:
                # restore if the slot is still empty
                if not os.path.exists(self.path):
                    try:
                        os.rename(grave, self.path)
                        return
                    except OSError:
                        pass
                os.remove(grave)
                return
        os.remove(grave)

    # -------------------------------------------------------------- acquire
    def acquire(self, wait: float = 0.0) -> bool:
        deadline = time.monotonic() + wait
        while True:
            token = uuid.uuid4().hex
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                self._token = token
                with os.fdopen(fd, "w") as fh:
                    json.dump(self._payload(), fh)
                return True
            except FileExistsError:
                pass
            info = self._read()
            pid = _pid_of(info)
            alive = _pid_alive(pid) if pid > 0 else None
            if alive is False:
                self._try_steal(info)  # provably dead: always stealable
                continue
            if alive is None and self._mtime_age() > self.stale_seconds:
                # unparseable or unprobeable holder: age rule only here
                self._try_steal(info)
                continue
            if time.monotonic() >= deadline:
                return False
            time.sleep(0.05)

    def refresh(self) -> bool:
        """Re-stamp the held lock's ts (call between long phases). Returns
        False — and drops our claim — if the on-disk lock is no longer ours
        (a contender legitimately stole it, e.g. our unprobeable pid aged
        out): re-stamping then would clobber the thief's lock and our later
        release() would delete it, yielding 2+ concurrent holders. Callers
        must treat False as 'lock lost: abort before the next publish'.
        (A steal landing between the ownership check and os.replace remains
        — plain-file locks cannot close it; the fenced marker publish is
        the correctness backstop there.)"""
        if self._token is None:
            return False
        info = self._read()
        if info is None:
            # absent/unreadable is AMBIGUOUS, not proof of theft: a
            # contender's _try_steal may hold the file in its graveyard
            # right now and will RESTORE it (we are alive and our payload
            # re-judges as live). Dropping our claim here would leave that
            # restored live-pid lock permanently unowned — nobody refreshes
            # it and acquire() never steals a live pid. Wait out the steal
            # window, then reclaim the slot if it is genuinely empty.
            for _ in range(5):
                time.sleep(0.05)
                info = self._read()
                if info is not None:
                    break
            if info is None:
                try:
                    fd = os.open(
                        self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                    )
                    with os.fdopen(fd, "w") as fh:
                        json.dump(self._payload(), fh)
                    return True  # reclaimed the empty slot
                except FileExistsError:
                    info = self._read()
                    if info is None:
                        self._token = None
                        return False
        if (
            info.get("token") != self._token
            or _pid_of(info) != os.getpid()
        ):
            self._token = None
            return False
        tmp = f"{self.path}.restamp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(self._payload(), fh)
        os.replace(tmp, self.path)
        return True

    def release(self) -> None:
        info = self._read()
        if (
            info is not None
            and info.get("token") == self._token
            and _pid_of(info) == os.getpid()
        ):
            try:
                os.remove(self.path)
            except FileNotFoundError:
                pass
        self._token = None
