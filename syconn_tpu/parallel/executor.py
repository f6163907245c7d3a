"""Host-side fan-out executor — the scheduler layer.

Replaces the reference's SLURM batch driver + param-pickle protocol
(reference: syconn/mp/batchjob_utils.py:69 ``batchjob_script``, :390
``batchjob_fallback``; syconn/mp/mp_utils.py) with an in-process executor
built for the TPU execution model:

* **Device work stays in the main process.** The TPU is a single shared
  resource; all JAX compute is batched there (vmap/scan over work items)
  instead of fanning out one process per GPU like the reference.
* **Host work fans out over threads** (IO, compression, meshing — numpy and
  zstd release the GIL) or optionally processes for pure-Python CPU work.
* Steps are plain functions in a registry; ``batchjob_script(params, name)``
  keeps the reference's call shape so the orchestration layer reads the
  same, but dispatches directly — no param pickles, no shell scripts.
* Failed items are retried (bounded), and completeness is validated: every
  param list must produce a result or the step raises.
"""

from __future__ import annotations

import logging
import os
import traceback
from concurrent.futures import FIRST_EXCEPTION, ProcessPoolExecutor, ThreadPoolExecutor, as_completed
from typing import Any, Callable, Dict, List, Optional, Sequence

import tqdm

log = logging.getLogger("syconn_tpu.parallel")

_STEP_REGISTRY: Dict[str, Callable] = {}


def register_step(name: str):
    """Register a function as a named pipeline step (worker entry point)."""

    def deco(fn):
        _STEP_REGISTRY[name] = fn
        return fn

    return deco


def get_step(name: str) -> Callable:
    if name not in _STEP_REGISTRY:
        raise KeyError(
            f"Unknown step '{name}'. Registered: {sorted(_STEP_REGISTRY)}"
        )
    return _STEP_REGISTRY[name]


def batchjob_enabled() -> bool:
    """Whether an external batch system drives the fan-out. Always False in
    this framework — the executor is in-process (see module docstring)."""
    return False


def _default_workers(backend: str) -> int:
    n = os.cpu_count() or 8
    return min(32, n) if backend == "thread" else max(1, n - 1)


def map_parallel(
    fn: Callable,
    params: Sequence,
    n_workers: Optional[int] = None,
    backend: str = "thread",
    show_progress: bool = False,
    desc: str = "",
    max_retries: int = 2,
) -> List[Any]:
    """Apply ``fn`` to each element of ``params`` with bounded retries.

    Results are returned in input order; a persistently failing item raises
    (completeness check — no silent dropped work).
    """
    params = list(params)
    if len(params) == 0:
        return []
    if n_workers is None:
        n_workers = _default_workers(backend)
    n_workers = max(1, min(n_workers, len(params)))
    if n_workers == 1 or backend == "serial":
        it = tqdm.tqdm(params, desc=desc, disable=not show_progress)
        return [fn(p) for p in it]

    pool_cls = ThreadPoolExecutor if backend == "thread" else ProcessPoolExecutor
    results: List[Any] = [None] * len(params)
    pending = list(range(len(params)))
    attempt = 0
    while pending and attempt <= max_retries:
        failed: List[int] = []
        errors: List[str] = []
        with pool_cls(max_workers=n_workers) as pool:
            futs = {pool.submit(fn, params[i]): i for i in pending}
            prog = tqdm.tqdm(
                total=len(futs), desc=desc, disable=not show_progress
            )
            for fut in as_completed(futs):
                i = futs[fut]
                try:
                    results[i] = fut.result()
                except Exception:
                    failed.append(i)
                    errors.append(traceback.format_exc())
                prog.update(1)
            prog.close()
        if failed and attempt == max_retries:
            raise RuntimeError(
                f"Step failed for {len(failed)}/{len(params)} items after "
                f"{max_retries + 1} attempts. First error:\n{errors[0]}"
            )
        if failed:
            log.warning(
                "Retrying %d failed items (attempt %d).", len(failed), attempt + 2
            )
        pending = failed
        attempt += 1
    return results


# ----------------------------------------------------- reference-shaped API
def start_multiprocess(
    func: Callable, params: Sequence, nb_cpus: Optional[int] = None, debug: bool = False, **kw
) -> List[Any]:
    """Pool.map equivalent (reference: mp_utils.py:93)."""
    backend = "serial" if debug else "thread"
    return map_parallel(func, params, n_workers=nb_cpus, backend=backend)


def start_multiprocess_imap(
    func: Callable,
    params: Sequence,
    nb_cpus: Optional[int] = None,
    show_progress: bool = True,
    debug: bool = False,
    desc: str = "",
    **kw,
) -> List[Any]:
    """Ordered parallel map with progress (reference: mp_utils.py:138)."""
    backend = "serial" if debug else "thread"
    return map_parallel(
        func, params, n_workers=nb_cpus, backend=backend, show_progress=show_progress, desc=desc
    )


def start_multiprocess_obj(
    func_name: str, params: Sequence, nb_cpus: Optional[int] = None, debug: bool = False
) -> List[Any]:
    """Call ``obj.func_name(*args)`` for each ``[obj, *args]`` in params
    (reference: mp_utils.py:203)."""

    def call(p):
        obj = p[0]
        return getattr(obj, func_name)(*p[1:])

    backend = "serial" if debug else "thread"
    return map_parallel(call, params, n_workers=nb_cpus, backend=backend)


def batchjob_script(
    params: Sequence,
    name: str,
    n_cores: int = 1,
    n_max_co_processes: Optional[int] = None,
    suffix: str = "",
    remove_jobfolder: bool = True,
    show_progress: bool = True,
    log=None,
    **kw,
) -> List[Any]:
    """Run registered step ``name`` over ``params`` (reference call shape:
    batchjob_utils.py:69). Returns the per-item results in order."""
    fn = get_step(name)
    return map_parallel(
        fn,
        params,
        n_workers=n_max_co_processes,
        backend="thread",
        show_progress=show_progress,
        desc=name,
    )
