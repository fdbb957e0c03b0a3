"""Crash-safe replace of a directory-shaped artifact (parquet dir,
compact-index dir) for foreachBatch maintainers.

``mode("overwrite")`` on the live path is delete-then-write: a crash
mid-write destroys the accumulated state AND whatever ledger protected
it. The swap here is write-sibling-temp → rmtree(live) → rename(tmp,
live); the long, failure-prone parquet write happens while the old
artifact is fully intact, shrinking the loss window to the two
metadata ops. :func:`recover` then closes even that window: if a crash
lands between the rmtree and the rename, the live path is missing but
the temp dir holds a COMPLETE replacement (parquet ``_SUCCESS`` marker
present) — every maintainer calls recover() before reading, which
promotes the orphaned temp dir and resumes exactly where the crashed
attempt finished (CMS's in-artifact batch-id ledger rides along, so
the replayed micro-batch still no-ops). An INCOMPLETE temp dir (crash
mid-write) is simply left for the next attempt's overwrite.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

TMP_SUFFIX = ".tmp"


def swap_in(out: DataFrame, artifact_path: str, *, coalesce: int | None = 1
            ) -> None:
    """Replace ``artifact_path`` with ``out``'s rows via a sibling temp
    dir; the previous artifact survives until the replacement is fully
    on disk."""
    tmp = artifact_path + TMP_SUFFIX
    w = out.coalesce(coalesce) if coalesce else out
    w.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(artifact_path, ignore_errors=True)
    os.rename(tmp, artifact_path)


def recover(artifact_path: str) -> bool:
    """Promote an orphaned-but-complete temp dir left by a crash
    between the rmtree and the rename. Returns True when a recovery
    happened. No-op when the artifact exists (a stale temp dir from a
    crash mid-write is left for the next swap's overwrite to clear)."""
    tmp = artifact_path + TMP_SUFFIX
    if (
        not os.path.exists(artifact_path)
        and os.path.isdir(tmp)
        and os.path.exists(os.path.join(tmp, "_SUCCESS"))
    ):
        os.rename(tmp, artifact_path)
        return True
    return False
