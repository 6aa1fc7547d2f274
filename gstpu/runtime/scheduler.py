"""Cooperative task scheduler: many streams, few threads.

TPU-native reinterpretation of the reference threadshare executor
(generic/threadshare/src/runtime/executor/scheduler.rs:36-80,
context.rs:148-276): a Context multiplexes many element tasks onto one
scheduling loop with a throttling wait period. Here the loop is also
the *batching window* — tasks enqueue device work, and one loop
iteration flushes a whole batch to the TPU (SURVEY.md §2.8 P2).

Tasks follow the reference Task state machine
(generic/threadshare/src/runtime/task.rs:28-66): Stopped → Prepared →
Started, with pause/flush triggers.
"""

from __future__ import annotations

import enum
import threading
import time
from typing import Callable, Optional

from gstpu.utils.log import debug_category

CAT = debug_category("scheduler")


class TaskState(enum.Enum):
    STOPPED = "stopped"
    PREPARED = "prepared"
    STARTED = "started"
    PAUSED = "paused"
    EOS = "eos"
    ERROR = "error"


class TaskResult(enum.Enum):
    CONTINUE = "continue"   # did work; call again
    IDLE = "idle"           # no work available right now
    PAUSE = "pause"
    EOS = "eos"
    ERROR = "error"


class Task:
    """One cooperative unit: repeatedly calls `iterate()` while
    STARTED."""

    def __init__(self, name: str, iterate: Callable[[], TaskResult],
                 prepare: Callable[[], None] | None = None,
                 stop: Callable[[], None] | None = None):
        self.name = name
        self.iterate = iterate
        self.prepare_fn = prepare
        self.stop_fn = stop
        self.state = TaskState.STOPPED

    def prepare(self):
        if self.state is TaskState.STOPPED:
            if self.prepare_fn:
                self.prepare_fn()
            self.state = TaskState.PREPARED

    def start(self):
        if self.state in (TaskState.PREPARED, TaskState.PAUSED,
                          TaskState.STOPPED):
            self.state = TaskState.STARTED

    def pause(self):
        if self.state is TaskState.STARTED:
            self.state = TaskState.PAUSED

    def stop(self):
        if self.stop_fn and self.state is not TaskState.STOPPED:
            self.stop_fn()
        self.state = TaskState.STOPPED

    def run_once(self) -> TaskResult:
        if self.state is not TaskState.STARTED:
            return TaskResult.IDLE
        try:
            r = self.iterate()
        except Exception:
            CAT.error("task %s raised", self.name)
            import traceback
            traceback.print_exc()
            self.state = TaskState.ERROR
            return TaskResult.ERROR
        if r is TaskResult.EOS:
            self.state = TaskState.EOS
        elif r is TaskResult.PAUSE:
            self.state = TaskState.PAUSED
        elif r is TaskResult.ERROR:
            self.state = TaskState.ERROR
        return r


class Context:
    """A named scheduling context; `wait` is the throttle/batching
    period in seconds (reference context-wait, in ms there)."""

    _contexts: dict[str, "Context"] = {}
    _lock = threading.Lock()

    def __init__(self, name: str, wait: float = 0.0):
        self.name = name
        self.wait = wait
        self.tasks: list[Task] = []

    @classmethod
    def acquire(cls, name: str = "default", wait: float = 0.0) -> "Context":
        with cls._lock:
            ctx = cls._contexts.get(name)
            if ctx is None:
                ctx = cls._contexts[name] = Context(name, wait)
            return ctx

    def add_task(self, task: Task) -> None:
        if task not in self.tasks:
            self.tasks.append(task)

    def remove_task(self, task: Task) -> None:
        if task in self.tasks:
            self.tasks.remove(task)

    def iterate(self) -> bool:
        """Run one scheduling round. Returns True if any task did
        work."""
        worked = False
        for t in list(self.tasks):
            r = t.run_once()
            if r is TaskResult.CONTINUE:
                worked = True
            elif r in (TaskResult.EOS, TaskResult.ERROR):
                self.remove_task(t)
        return worked

    def run_until_idle(self, timeout: float | None = None) -> None:
        deadline = None if timeout is None else time.monotonic() + timeout
        while self.tasks:
            worked = self.iterate()
            if not worked:
                if all(t.state in (TaskState.EOS, TaskState.ERROR,
                                   TaskState.STOPPED, TaskState.PAUSED)
                       for t in self.tasks):
                    return
                if self.wait:
                    time.sleep(self.wait)
            if deadline is not None and time.monotonic() > deadline:
                raise TimeoutError(f"context {self.name}: run timed out")
