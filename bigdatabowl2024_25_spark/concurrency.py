"""Driver-side overlap of independent construction-time Spark jobs.

Several suite queries pay most of their wall time BEFORE the final
collect: eager ``localCheckpoint`` lineage cuts run ``toRdd``
mini-executions at construction under AQE, tokenizer trainers loop
driver-side probes, sink roundtrips write at build time, and the
size-adaptive connected-components executes its strategy count when
called. Those jobs are independent across union branches, yet they
run strictly one after another because the driver builds branches
sequentially — leaving a 32-core local box (or a 1000-executor
cluster) mostly idle during each one's tail.

Spark's scheduler happily runs several jobs at once inside one
application (actions are only sequential because driver code calls
them sequentially — optimization-guide §2.6), and FIFO scheduling
gives exactly the back-fill behaviour wanted here: the earlier job's
straggler tail is padded with the next job's tasks. This helper is
the one sanctioned way the suite overlaps such work, so the pattern
stays greppable and bounded.

Thread-safety notes: DataFrame/Column construction is py4j calls
(released GIL during JVM work); job-description/group properties are
thread-local in Spark, so concurrent builders do not clobber each
other's labels. Builders must not mutate shared Python state.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from typing import TypeVar

T = TypeVar("T")

#: cap on concurrent construction jobs per call — enough to fill a
#: straggler tail, not so many that mini-jobs fight for executors
#: (guide §2.6: "2-3 jobs in flight is plenty"; branches here are
#: mini-jobs of a few hundred ms, so a slightly deeper pool pays)
MAX_WORKERS = 8


def build_concurrently(
    builders: dict[str, Callable[[], T]],
) -> dict[str, T]:
    """Run independent 0-arg builders in driver threads; return their
    results keyed like the input (insertion order preserved, so a
    union built from the result dict has a deterministic branch
    order). Any builder exception propagates to the caller — but only
    AFTER every sibling builder has run to completion (results are
    gathered in insertion order and the pool's context join waits for
    all threads), so a failing branch does not cancel the others'
    in-flight Spark jobs; it does guarantee no half-built branch is
    still running by the time the exception surfaces (ADVICE r15
    wording fix)."""
    if len(builders) <= 1:
        return {k: fn() for k, fn in builders.items()}
    with ThreadPoolExecutor(
        max_workers=min(MAX_WORKERS, len(builders))
    ) as pool:
        futures = {k: pool.submit(fn) for k, fn in builders.items()}
        return {k: f.result() for k, f in futures.items()}
