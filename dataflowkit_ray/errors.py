"""Structured error taxonomy — retryable vs fatal, stated not implied.

The reference wraps every failure in a typed kind so callers can decide
to retry or reject (``errs/`` package: BadRequest / BadGateway /
Timeout, surfaced by the transports).  The engine analog is three kinds
with an explicit ``retryable`` flag:

* :class:`BadRequest` — the payload/spec itself is invalid; retrying
  the identical request can never succeed (checkPayload's 400 class).
  ``spec.SpecError`` subclasses it (and ``ValueError``, so existing
  callers keep working).
* :class:`RetryableIOError` — a transient source/sink I/O failure after
  the in-band retry (primary + fallback codec both failed); re-running
  the same chunk may succeed (the reference's BadGateway/Timeout class).
* :class:`StateError` — persisted state (checkpoint, resume markers,
  partition layout) contradicts the request; retrying won't fix it,
  a human decision (fresh work_dir / resume=False) is required.

``is_retryable(exc)`` is the single dispatch point for job-level retry
loops (e.g. a scheduler wrapping the service's job queue).
"""

from __future__ import annotations


class EngineError(Exception):
    """Base of the engine's typed errors."""

    retryable: bool = False


class BadRequest(EngineError):
    """Invalid job payload/spec — never retry the identical request."""

    retryable = False


class RetryableIOError(EngineError, IOError):
    """Transient source/sink failure (after in-band codec fallback)."""

    retryable = True


class StateError(EngineError, ValueError):
    """Persisted state (checkpoint / resume markers / partition layout)
    contradicts the request; needs an operator decision, not a retry."""

    retryable = False


def is_retryable(exc: BaseException) -> bool:
    """True when re-running the SAME work item may succeed."""
    if isinstance(exc, EngineError):
        return exc.retryable
    # non-engine exceptions: conservative — treat OS-level I/O as
    # transient, everything else as a bug/fatal
    return isinstance(exc, (IOError, TimeoutError, ConnectionError))
