"""Async rate-limiting decorator for GUI callbacks (reference
`src/ark/utils/metacluster_remap_gui/throttle.py:5-70`): first call fires
immediately, intermediate calls are dropped, the final call always lands."""

from __future__ import annotations

import asyncio
from time import time


def throttle(wait):
    """Decorator factory: rate-limit `fn` to once per `wait` seconds inside
    an asyncio app, guaranteeing the last call executes."""
    def decorator(fn):
        time_of_last_call = 0
        timer = _NullTimer()

        def current_wait_time():
            time_since_last_call = time() - time_of_last_call
            return max(0, wait - time_since_last_call)

        def throttled(*args, **kwargs):
            nonlocal time_of_last_call, timer

            def call_it():
                nonlocal time_of_last_call
                time_of_last_call = time()
                fn(*args, **kwargs)

            timer.cancel()
            timer = _Timer(current_wait_time(), call_it)
            timer.start()
        return throttled
    return decorator


class _NullTimer:
    def cancel(self):
        pass


class _Timer:
    def __init__(self, timeout, callback):
        self._task = None
        self._timeout = timeout
        self._callback = callback

    async def _job(self):
        await asyncio.sleep(self._timeout)
        self._callback()

    def start(self):
        self._task = asyncio.ensure_future(self._job())

    def cancel(self):
        if self._task is not None:
            self._task.cancel()
