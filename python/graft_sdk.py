"""graft Tier-2 Python resource SDK (stdlib only).

A resource is a decorated generator yielding dict rows. The harness
(graft.sources.PythonResource) launches ``python3 <script>`` with the
resume position in ``GRAFT_RESUME_POSITION`` (typed position JSON, the
same encoding the ledger stores) and reads newline-delimited JSON
messages from stdout:

    {"type": "resource", "name": ..., "schema": {...}, "cursor": ...,
     "bounded": ..., "primary_key": [...], "write_disposition": ...}
    {"type": "record", "data": {...}}
    {"type": "position", "position": {"kind": "cursor", ...}}
    {"type": "error", "message": "..."}

Mirrors the reference's Python resource contract (cdf:
python/cdf_sdk/resource.py — name/primary_key/cursor/bounded/schema/
write_disposition declarations) re-expressed over a subprocess seam:
positions are TYPED values, not engine-private blobs, so resume flows
through the same ledger machinery as every other source.

Schema types: long | double | string | boolean (nullable by default;
use (type, False) tuples for required fields).
"""

import json
import os
import sys


def resource(name=None, primary_key=(), cursor=None, bounded=True,
             schema=None, write_disposition="append"):
    """Decorator declaring a Tier-2 resource over a generator function."""
    def decorate(fn):
        fn.__graft_resource__ = True
        fn.__graft_name__ = name or fn.__name__
        fn.__graft_primary_key__ = tuple(primary_key)
        fn.__graft_cursor__ = cursor
        fn.__graft_bounded__ = bool(bounded)
        fn.__graft_schema__ = dict(schema or {})
        fn.__graft_write_disposition__ = write_disposition
        return fn
    return decorate


def resume_position():
    """The typed position committed by the last run, or None."""
    raw = os.environ.get("GRAFT_RESUME_POSITION", "")
    return json.loads(raw) if raw else None


def resume_cursor_value(default=None):
    pos = resume_position()
    if pos and pos.get("kind") == "cursor":
        return pos.get("value")
    return default


def _emit(msg):
    sys.stdout.write(json.dumps(msg, separators=(",", ":")) + "\n")


def run(fn):
    """Drive one resource: declaration, records, final typed position.

    The cursor position is tracked automatically as max(row[cursor])
    over emitted rows — monotone, so replay/resume is exact.
    """
    if not getattr(fn, "__graft_resource__", False):
        raise TypeError("run() expects an @resource-decorated function")
    norm_schema = {
        f: (t if isinstance(t, (list, tuple)) else (t, True))
        for f, t in fn.__graft_schema__.items()
    }
    _emit({
        "type": "resource",
        "name": fn.__graft_name__,
        "schema": {f: {"type": t, "nullable": n} for f, (t, n) in norm_schema.items()},
        "cursor": fn.__graft_cursor__,
        "bounded": fn.__graft_bounded__,
        "primary_key": list(fn.__graft_primary_key__),
        "write_disposition": fn.__graft_write_disposition__,
    })
    cursor = fn.__graft_cursor__
    frontier = None
    try:
        for row in fn():
            if not isinstance(row, dict):
                raise TypeError("resource rows must be dicts")
            _emit({"type": "record", "data": row})
            if cursor is not None and row.get(cursor) is not None:
                v = int(row[cursor])
                frontier = v if frontier is None else max(frontier, v)
    except Exception as e:  # surface, never swallow
        _emit({"type": "error", "message": f"{type(e).__name__}: {e}"})
        sys.exit(1)
    if cursor is not None and frontier is not None:
        _emit({"type": "position",
               "position": {"kind": "cursor", "field": cursor, "value": frontier}})
