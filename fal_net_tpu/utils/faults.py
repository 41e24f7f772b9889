"""Transient-failure detection and recovery.

The reference has NO failure detection (SURVEY §5): recovery is manual —
relaunch with ``--pretrained`` and ``--start_epoch``
(``Train_Stage1_K.py:65-70,183-184``).  This framework targets
accelerators reached through a networked runtime (PJRT plugins; the axon
relay in this container), where an individual dispatch can fail
transiently — observed in practice as a one-off ``FAILED_PRECONDITION``
during a long stage-2 run whose immediate retry succeeded.  This module
centralizes the policy:

- :func:`is_transient` — message-based classification of retryable
  runtime errors (never classifies Python-side errors as retryable);
- :func:`retry_transient` — bounded retry with linear backoff for
  NON-DONATING dispatches (evaluation, validation, metric fetches),
  where re-issuing the same call is always safe;
- :func:`tree_alive` — liveness probe for donated pytrees.  The train
  step donates the optimizer state, so after a failed dispatch the old
  state buffers may already be invalid; the Trainer uses this to choose
  between retry-in-place and restoring its last host-side snapshot
  (``train/trainer.py``).
"""

import time
from typing import Any, Callable, Optional, Tuple

import jax

# Substrings identifying retryable runtime failures.  Deliberately
# conservative: gRPC/absl status names that only transport or
# service-availability layers emit, never shape/dtype/compile errors.
TRANSIENT_MARKERS: Tuple[str, ...] = (
    "FAILED_PRECONDITION",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Socket closed",
    "Connection reset",
)
# NOT listed: RESOURCE_EXHAUSTED — device OOM is deterministic; retrying
# the identical program just re-OOMs and hides a configuration error.


def is_transient(exc: BaseException) -> bool:
    """True when ``exc`` looks like a retryable runtime/transport failure."""
    if isinstance(exc, (KeyboardInterrupt, SystemExit)):
        return False
    msg = str(exc)
    return any(marker in msg for marker in TRANSIENT_MARKERS)


def retry_transient(
    fn: Callable[..., Any],
    *args: Any,
    retries: int = 2,
    backoff_s: float = 2.0,
    describe: str = "",
    on_retry: Optional[Callable[[BaseException, int], None]] = None,
    **kwargs: Any,
) -> Any:
    """Call ``fn(*args, **kwargs)``, retrying up to ``retries`` times on
    transient failures (for non-donating dispatches only — a donating
    call needs the liveness dance in the Trainer instead).

    Non-transient errors and exhausted retries re-raise the original
    exception unchanged.
    """
    retries = max(0, int(retries))
    for attempt in range(retries + 1):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 - classified below
            if not is_transient(e) or attempt == retries:
                raise
            if on_retry is not None:
                on_retry(e, attempt)
            else:
                what = describe or getattr(fn, "__name__", "call")
                print(
                    f"=> transient failure in {what} "
                    f"(attempt {attempt + 1}/{retries + 1}): {e!r}; retrying"
                )
            time.sleep(backoff_s * (attempt + 1))
    raise AssertionError("unreachable")


def fetch_with_redispatch(
    fetch: Callable[[], Any],
    redispatch: Callable[[], None],
    retries: int = 2,
    backoff_s: float = 2.0,
    describe: str = "fetch",
) -> Any:
    """Pull async results to host with transient-failure recovery.

    Dispatch is asynchronous on remote backends, so an execution failure
    usually surfaces at the device->host ``fetch``; when that happens
    transiently, ``redispatch`` re-runs the computation (callers close
    over their still-resident device inputs and rebind whatever ``fetch``
    reads) and the fetch is retried.  ``redispatch``'s own transient
    failures consume the same retry budget.  For NON-donating dispatches
    only — the donating train step needs the snapshot-rollback dance in
    the Trainer instead.
    """
    retries = max(0, int(retries))
    for attempt in range(retries + 1):
        try:
            if attempt:
                redispatch()
            return fetch()
        except Exception as e:  # noqa: BLE001 - classified below
            if not is_transient(e) or attempt == retries:
                raise
            print(
                f"=> transient {describe} failure, re-running "
                f"(attempt {attempt + 1}/{retries + 1}): {e!r}"
            )
            time.sleep(backoff_s * (attempt + 1))
    raise AssertionError("unreachable")


def run_bounded(fn: Callable[[], Any], budget_s: float):
    """Run ``fn`` on a daemon thread, joined with a timeout.

    Returns ``(ok, value_or_error, seconds)``.  A remote backend that
    dies mid-call parks the caller inside a blocking C call where no
    signal handler can fire; the thread-join converts that into a
    ``TimeoutError`` (message carries DEADLINE_EXCEEDED so
    :func:`is_transient` classifies it).  The abandoned thread stays
    parked until process exit (daemon) — do NOT start another attempt of
    work that must not run twice in the same process; use a subprocess
    for that (see bench.py).
    """
    result: dict = {}

    def target():
        try:
            result["value"] = fn()
        except BaseException as e:  # noqa: BLE001 - reported to the caller
            result["error"] = e

    import threading

    t = threading.Thread(target=target, daemon=True)
    t0 = time.time()
    t.start()
    t.join(budget_s)
    dt = time.time() - t0
    if t.is_alive():
        return False, TimeoutError(
            f"DEADLINE_EXCEEDED: no response in {budget_s:.0f}s"
        ), dt
    if "error" in result:
        return False, result["error"], dt
    return True, result.get("value"), dt


def tree_alive(tree: Any) -> bool:
    """True when no jax.Array leaf of ``tree`` has been deleted/donated."""
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array):
            try:
                if leaf.is_deleted():
                    return False
            except Exception:  # noqa: BLE001 - treat unknown state as dead
                return False
    return True
