"""Asynchronous local-mapping driver.

The reference runs LocalMapping on its own thread consuming a keyframe
queue (reference: src/System.cc:197 thread launch, LocalMapping::Run
src/LocalMapping.cc:64 polling mlNewKeyFrames). This wrapper restores that
pipeline overlap for the TPU build: keyframe processing (triangulation,
fusion, local BA — seconds of device dispatches + readbacks on a tunneled
TPU) runs on a worker thread while the fused tracking loop keeps streaming
frames against the current map cache.

Synchronization: a single map lock serializes map mutation (worker) against
the tracker's host-side reads/writes — the moral equivalent of the
reference's Map::mMutexMapUpdate (src/Tracking.cc:1888), but scoped to
keyframe-rate events instead of every frame.
"""
from __future__ import annotations

import queue
import threading

from .local_mapper import LocalMapper


class AsyncLocalMapper:
    def __init__(self, mapper: LocalMapper, map_lock=None, post_fn=None):
        self.mapper = mapper
        self.lock = map_lock or threading.RLock()
        mapper.lock = self.lock  # fine-grained phase locking inside
        # post_fn(k): runs after local mapping, under the map lock — the
        # downstream per-keyframe stage (loop closing), mirroring the
        # reference pipeline order LocalMapping -> LoopClosing
        # (src/LocalMapping.cc:255 region enqueues to the loop thread).
        self.post_fn = post_fn
        # init_fn(): staged IMU init hook, run after each keyframe's mapping
        # cycle on THIS worker thread (reference: LocalMapping::Run order —
        # local BA, then InitializeIMU/VIBA/ScaleRefinement,
        # src/LocalMapping.cc:148-244). The hook manages its own locking:
        # snapshot/commit under the map lock, solves unlocked.
        self.init_fn = None
        self.queue: queue.Queue = queue.Queue()
        self._stop = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self.processed = 0
        self.errors: list = []
        # staged-init solves run on their own single-flight thread: a cold
        # inertial solve costs tens of seconds on a remote-compile chip, and
        # running it inline in the worker loop stalled keyframe processing
        # (no triangulation) until the tracking frontier starved into a loss
        # (measured at every VIBA event on the tunneled v5e). The init hook
        # does its own snapshot/commit locking and epoch-aborts, so only
        # single-flight needs enforcing here.
        self._init_thread: threading.Thread | None = None

    def on_keyframe(self, k: int):
        """Tracker-side hook: enqueue and return immediately. The slot's
        frame id is captured so the worker can detect cull-and-reuse races
        (slot k culled, then reallocated to a different keyframe while the
        queue entry was in flight) and skip the stale entry."""
        self.queue.put((int(k), int(self.mapper.map.kf_frame_id[k])))

    def busy(self) -> bool:
        """Backlogged, not merely working: with a continuous keyframe stream
        the worker is almost always mid-cycle, and reporting busy then
        suppresses the tracked-ratio keyframe trigger for whole chunks
        (reference gate: with the mapper busy, NeedNewKeyFrame still
        inserts while KeyframesInQueue() < 3 after InterruptBA,
        src/Tracking.cc:3099 region — an in-progress cycle accepts
        interrupts; our BA deferral under backlog is the InterruptBA
        analog)."""
        return self.queue.qsize() >= 3

    def _run(self):
        while not self._stop:
            try:
                k, fid = self.queue.get(timeout=0.2)
            except queue.Empty:
                continue
            try:
                m = self.mapper.map
                if not m.kf_valid[k] or int(m.kf_frame_id[k]) != fid:
                    continue  # slot culled (or culled+reused) since enqueue
                # reference parity: local BA only at queue quiescence
                # (src/LocalMapping.cc:148-155); a backlog defers the solve,
                # never the map growth
                self.mapper.on_keyframe(k, skip_ba=not self.queue.empty())
                if self.init_fn is not None and (
                    self._init_thread is None
                    or not self._init_thread.is_alive()
                ):
                    self._init_thread = threading.Thread(
                        target=self._run_init, daemon=True
                    )
                    self._init_thread.start()
                if self.post_fn is not None:
                    with self.lock:
                        self.post_fn(k)
                self.processed += 1
            except Exception as e:  # surface in flush(); don't kill the thread
                self.errors.append((k, repr(e)))
            finally:
                self.queue.task_done()

    def wait_drained(self, max_backlog: int = 1, timeout: float = 60.0):
        """Backpressure: block until the queue is at most max_backlog deep.

        The reference's tracker effectively stalls behind LocalMapping via
        mMutexMapUpdate and the stop/idle protocol; an unbounded queue here
        instead lets keyframes go stale before triangulation/BA, which
        silently degrades the map (measured: stereo scale drift once the
        worker falls >2 keyframes behind). MUST be called WITHOUT the map
        lock held (the worker needs it to make progress)."""
        import time as _time

        t0 = _time.monotonic()
        while (
            self.queue.qsize() > max_backlog
            and _time.monotonic() - t0 < timeout
        ):
            _time.sleep(0.002)

    def _run_init(self):
        try:
            self.init_fn()
        except Exception as e:  # surfaced via flush(), like worker errors
            self.errors.append(("init", repr(e)))

    def flush(self, timeout: float = 120.0):
        """Block until the queue drains AND any in-flight staged-init solve
        commits (end of sequence / tests)."""
        self.queue.join()
        t = self._init_thread
        if t is not None and t.is_alive():
            t.join(timeout=timeout)
        if self.errors:
            raise RuntimeError(f"async mapper errors: {self.errors}")

    def shutdown(self):
        self._stop = True
        self._worker.join(timeout=5.0)
        t = self._init_thread
        if t is not None and t.is_alive():
            t.join(timeout=5.0)
