"""Worker-level idempotent resume for chunked pipeline steps.

Reference parity: SyConn workers skip already-produced outputs so a crashed
multi-hour step resumes instead of restarting (mesh-cache check
syconn/proc/sd_proc.py:689-726; ``if syn_ssv_id not in attr_dc`` skip
syconn/extraction/cs_processing_steps.py:455). Here the mechanism is a
:class:`StepCache`: one atomically-written pickle per work item under
``<wd>/.stepcache/<step>/``. A rerun loads completed items and computes
only the missing ones; ``overwrite=True`` clears the cache first. Side
effects (chunk writes) happen *before* the item result is stored, and
chunk files are written atomically (tmp + rename), so a marker implies the
item's outputs are durable.
"""

from __future__ import annotations

import logging
import os
import pickle
import shutil
import threading
from typing import Any, Callable, Optional, Sequence

log = logging.getLogger("syconn_tpu.stepcache")

__all__ = ["StepCache", "cached_map", "step_cache_dir"]


def step_cache_dir(step: str, working_dir: Optional[str] = None) -> str:
    """Canonical cache directory of a named step under the working dir."""
    if working_dir is None:
        from .. import global_params

        working_dir = str(global_params.config.working_dir)
    return os.path.join(working_dir, ".stepcache", step)


class StepCache:
    """Per-item resumable result store of one pipeline step."""

    def __init__(self, step: str, working_dir: Optional[str] = None,
                 overwrite: bool = False):
        self.dir = step_cache_dir(step, working_dir)
        if overwrite and os.path.isdir(self.dir):
            shutil.rmtree(self.dir)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.dir, f"{key}.pkl")

    def done(self, key: str) -> bool:
        return os.path.isfile(self._path(key))

    def load(self, key: str) -> Any:
        with open(self._path(key), "rb") as f:
            return pickle.load(f)

    def store(self, key: str, value: Any) -> None:
        p = self._path(key)
        tmp = f"{p}.tmp{os.getpid()}_{threading.get_ident()}"
        with open(tmp, "wb") as f:
            pickle.dump(value, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, p)

    def clear(self) -> None:
        if os.path.isdir(self.dir):
            shutil.rmtree(self.dir)
        os.makedirs(self.dir, exist_ok=True)

    # step-level completeness: lets callers distinguish "outputs exist and
    # the step finished" from "outputs exist but the run crashed mid-step"
    @property
    def _complete_path(self) -> str:
        return os.path.join(self.dir, "__complete__")

    def mark_complete(self) -> None:
        with open(self._complete_path, "w") as f:
            f.write("done\n")

    def is_complete(self) -> bool:
        return os.path.isfile(self._complete_path)


def cached_map(
    fn: Callable,
    params: Sequence,
    cache: Optional[StepCache],
    key_fn: Callable[[Any], str] = None,
    **map_kw,
):
    """``map_parallel`` with per-item resume through ``cache``.

    Completed items (marker present) load their stored result; the rest run
    ``fn`` and store before returning. With ``cache=None`` this is plain
    ``map_parallel``.
    """
    from ..parallel.executor import map_parallel

    if cache is None:
        return map_parallel(fn, params, **map_kw)
    if key_fn is None:
        key_fn = lambda p: "_".join(str(int(x)) for x in p)  # noqa: E731
    n_done = sum(1 for p in params if cache.done(key_fn(p)))
    if n_done:
        log.info(
            "resume: %d/%d items already complete in %s — skipping them",
            n_done, len(params), cache.dir,
        )

    def work(p):
        k = key_fn(p)
        if cache.done(k):
            return cache.load(k)
        v = fn(p)
        cache.store(k, v)
        return v

    return map_parallel(work, params, **map_kw)
