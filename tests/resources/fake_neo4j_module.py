"""A behavioral stand-in for the ``neo4j`` Python driver, good enough to
drive :func:`knetminer_etl_spark.io.neo4j.load_pg_to_neo4j` end-to-end
through real Spark executor processes without a database.

Shipped to executors as a top-level ``neo4j`` module via
``SparkContext.addPyFile`` (tests copy this file to ``<tmp>/neo4j.py``).
State crosses process boundaries through the directory encoded in the
connection URI (``fake:///abs/dir``):

* every ``tx.run(cypher, batch=...)`` appends a JSON record to
  ``records_<pid>_<uuid>.jsonl`` in that directory, classified as
  ``nodes`` / ``edges`` / ``index`` / ``other`` from the Cypher text;
* edge batches validate their endpoints against the node records already
  on disk — the offline analogue of the real Cypher's ``1/0``
  dangling-endpoint bomb (works because the loader's node pass completes
  before any edge task starts);
* if a file named ``INJECT_TRANSIENT`` exists in the directory, the
  FIRST ``execute_write`` in each OS process raises
  ``FakeTransientError`` (name matches the loader's default transient
  classifier) and logs the attempt — proving the retry wrapper actually
  re-runs executor-side transactions.

Only the API surface the loader touches is implemented:
``GraphDatabase.driver(uri, auth=...)``, ``driver.session(database=...)``
(context manager), ``session.run(...).consume()``,
``session.execute_write(fn)`` with ``fn(tx)``/``tx.run(...).consume()``,
``driver.close()``.
"""

import json
import os
import re
import uuid

_FAILED_ONCE = False  # per-process transient-injection latch


class FakeTransientError(Exception):
    """Classified as retryable by run_with_retry's default predicate
    ("Transient" in the type name)."""


class FakeClientError(Exception):
    """Permanent failure (dangling endpoint)."""


def _dir_from_uri(uri):
    if not uri.startswith("fake://"):
        raise ValueError(f"fake driver needs a fake:// uri, got {uri!r}")
    return uri[len("fake://") :]


def _node_ids_on_disk(dirpath):
    ids = set()
    for name in os.listdir(dirpath):
        if not name.startswith("records_"):
            continue
        with open(os.path.join(dirpath, name)) as fh:
            for line in fh:
                rec = json.loads(line)
                if rec["kind"] == "nodes":
                    ids.update(row["id"] for row in rec["batch"])
    return ids


class _Result:
    def consume(self):
        return None


class _Tx:
    def __init__(self, dirpath):
        self._dir = dirpath

    def run(self, cypher, batch=None, **params):
        kind = "other"
        rel_type = None
        labels = None
        if cypher.lstrip().startswith("CREATE INDEX"):
            kind = "index"
        elif "OPTIONAL MATCH" in cypher:
            kind = "edges"
            m = re.search(r"\[e:`?([^`\]]+)`?\]", cypher)
            rel_type = m.group(1) if m else None
            have = _node_ids_on_disk(self._dir)
            for row in batch or []:
                if row["from"] not in have or row["to"] not in have:
                    raise FakeClientError(
                        f"dangling endpoint in edge {row['id']!r}: "
                        f"{row['from']!r} -> {row['to']!r} (1/0 analogue)"
                    )
        elif "CREATE (n" in cypher:
            kind = "nodes"
            m = re.search(r"CREATE \(n((?::`?[^:`)]+`?)+)\)", cypher)
            labels = (
                [l.strip("`") for l in m.group(1).split(":") if l]
                if m
                else []
            )
        rec = {
            "kind": kind,
            "cypher": cypher,
            "batch": batch,
            "rel_type": rel_type,
            "labels": labels,
            "params": params or None,
            "pid": os.getpid(),
        }
        path = os.path.join(
            self._dir, f"records_{os.getpid()}_{uuid.uuid4().hex}.jsonl"
        )
        with open(path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        return _Result()


class _Session:
    def __init__(self, dirpath):
        self._dir = dirpath

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def run(self, cypher, **params):
        return _Tx(self._dir).run(cypher, **params)

    def execute_write(self, fn, *args, **kwargs):
        global _FAILED_ONCE
        if (
            os.path.exists(os.path.join(self._dir, "INJECT_TRANSIENT"))
            and not _FAILED_ONCE
        ):
            _FAILED_ONCE = True
            with open(
                os.path.join(self._dir, "transient_attempts.log"), "a"
            ) as fh:
                fh.write(f"{os.getpid()}\n")
            raise FakeTransientError("injected transient collision")
        return fn(_Tx(self._dir), *args, **kwargs)


class _Driver:
    def __init__(self, uri):
        self._dir = _dir_from_uri(uri)

    def session(self, database=None):
        return _Session(self._dir)

    def close(self):
        pass


class GraphDatabase:
    @staticmethod
    def driver(uri, auth=None, **kwargs):
        return _Driver(uri)
