"""Shared fixture-root path for the synthetic on-disk fixtures.

PER-PROCESS (pid-suffixed): the fixture queries write deterministic
files under this root and re-read them in the same process; a FIXED
path raced when two local sessions ran concurrently (one process's
idempotent overwrite mid-write while another read — observed as a
transient finalize_snapshot parity failure during a parallel pytest +
check_parity run). The driver runs single-process, so the suffix only
isolates developer parallelism; stale roots in /tmp are bounded by the
fixture size (a few MB) and the OS tmp cleaner."""

from __future__ import annotations

import os

FIXTURE_ROOT = f"/tmp/tracy_matdb_fixtures-{os.getpid()}"
