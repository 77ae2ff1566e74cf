"""The documented object-store swap point, proven: re-run the ENTIRE
concurrency battery with ``VersionedTable._publish_commit`` replaced by
a compare-and-swap double.

``_publish_commit`` (table_format.py) is THE atomicity primitive a
multi-writer deployment overrides — the local ``os.link`` + unlink is
documented as interchangeable with Delta's LogStore / Iceberg's catalog
conditional-PUT. This module pins that contract: every commit in the
battery routes through ``_CasStore.put_if_absent`` (an in-process
registry + lock emulating an object store's atomic if-none-match PUT —
the existence check and the publish are one critical section, the way
S3 conditional writes / GCS preconditions behave), and the whole
conflict matrix, txn coordinator, checkpoint, and identity-allocation
behavior must survive unchanged.

The star-import is deliberate: pytest collects every test_concurrency
test again IN THIS MODULE, where the autouse fixture swaps the
primitive — one battery, two publish implementations.
"""

from __future__ import annotations

import os
import threading

import pytest

import daas_apps_spark.sources.table_format as tf
from tests.test_concurrency import *  # noqa: F401,F403 — re-run the battery


class _CasStore:
    """In-memory conditional-PUT double: one service-side critical
    section covering existence check + object materialization."""

    def __init__(self):
        self._lock = threading.Lock()
        self._keys: set[str] = set()

    def put_if_absent(self, tmp: str, final: str) -> bool:
        with self._lock:
            if final in self._keys or os.path.exists(final):
                return False
            # materialize inside the critical section — the "service"
            # performing the conditional write
            os.rename(tmp, final)
            self._keys.add(final)
            return True


@pytest.fixture(autouse=True)
def cas_publish(monkeypatch):
    store = _CasStore()

    def publish(self, tmp: str, final: str) -> None:
        if not store.put_if_absent(tmp, final):
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass
            raise tf.CommitConflictError(
                f"version file {os.path.basename(final)} already exists "
                "— a concurrent (or crashed-and-retried) writer "
                "committed this version first; re-read the log and "
                "retry the operation against the new snapshot"
            )

    monkeypatch.setattr(tf.VersionedTable, "_publish_commit", publish)
    yield


def test_cas_double_is_actually_installed(spark, tmp_path):
    """Meta-test: the fixture really routes commits through the CAS
    registry (a second publish of the same version key loses), so the
    battery above is genuinely exercising the swapped primitive."""
    vt = tf.VersionedTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1,)], "k long")
    vt.append(df)
    [commit1] = [
        n
        for n in os.listdir(vt._log_dir())
        if tf._COMMIT_NAME.fullmatch(n)
    ]
    final = os.path.join(vt._log_dir(), commit1)
    tmp = os.path.join(vt._log_dir(), ".tmp-x.json")
    with open(tmp, "w") as f:
        f.write("{}")
    with pytest.raises(tf.CommitConflictError):
        vt._publish_commit(tmp, final)
    assert not os.path.exists(tmp)  # loser's temp is cleaned up
