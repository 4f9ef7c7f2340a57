"""Tracing / profiling utilities — new TPU-first design.

The reference has no observability beyond tqdm bars (SURVEY.md §5). Here:
- `phase(name)`: wall-clock phase timer with a process-wide report.
- `trace(dir)`: jax.profiler trace context (view in TensorBoard/Perfetto or
  xprof) capturing XLA ops, HBM usage, and ICI collectives.
- `log`: a namespaced stdlib logger replacing bare print().
- `device_memory_stats()`: per-device HBM accounting (replaces
  mx.metal.clear_cache-style manual memory management, which is unnecessary
  under XLA's arena allocator).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import OrderedDict
from typing import Dict, Iterator, Optional

import jax

log = logging.getLogger("ltx2_tpu")
if not log.handlers:
    _handler = logging.StreamHandler()
    _handler.setFormatter(logging.Formatter("[%(name)s] %(levelname)s %(message)s"))
    log.addHandler(_handler)
    log.setLevel(logging.INFO)

_PHASE_TIMES: "OrderedDict[str, float]" = OrderedDict()


_SYNC_TOKEN_FN = None


def _device_barrier() -> None:
    """Best-effort drain of dispatched device work on the DEFAULT device:
    enqueue a trivial program and block on it — PjRt executes each device's
    compute stream in order, so a later-enqueued program completes only
    after all previously dispatched work. `jax.effects_barrier()` alone
    only waits on effect tokens (io_callback/debug), NOT pure dispatched
    computations (review r4: the old sync did nothing for compute). Work
    dispatched to OTHER devices of a mesh is not covered; phases wrapping
    sharded work should materialize their outputs (np.asarray /
    block_until_ready), which every pipeline already does."""
    global _SYNC_TOKEN_FN
    try:
        if _SYNC_TOKEN_FN is None:
            _SYNC_TOKEN_FN = jax.jit(lambda x: x + 1)
        jax.effects_barrier()
        jax.block_until_ready(_SYNC_TOKEN_FN(0))
    except Exception:
        pass


@contextlib.contextmanager
def phase(name: str, sync: bool = True) -> Iterator[None]:
    """Time a pipeline phase; accumulates into the process-wide report.

    sync=True drains outstanding default-device work before stopping the
    clock so the number reflects execution, not dispatch (see
    _device_barrier for scope).
    """
    start = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            _device_barrier()
        elapsed = time.perf_counter() - start
        _PHASE_TIMES[name] = _PHASE_TIMES.get(name, 0.0) + elapsed
        log.info("phase %-24s %8.2f s", name, elapsed)


def phase_report() -> Dict[str, float]:
    """Accumulated per-phase wall-clock seconds."""
    return dict(_PHASE_TIMES)


def reset_phases() -> None:
    _PHASE_TIMES.clear()


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory stats (bytes) where the backend reports them."""
    stats = {}
    for dev in jax.devices():
        try:
            stats[str(dev)] = dict(dev.memory_stats() or {})
        except Exception:
            stats[str(dev)] = {}
    return stats
