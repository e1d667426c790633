"""Document tags + tag filtering (J4).

Reference: ``Document.tags`` (``eschergraph/persistence/document.py:10-29``)
and ``filter_documents_by_tags``
(``eschergraph/persistence/adapters/simple_repository/simple_repository.py:693-723``):
a document is included iff, for EVERY requested (key, value) filter,
either the document carries the key with exactly that value, or the key
is missing and ``ignore_missing_tags`` is True. Missing-tag documents
are excluded by default.

Ray-native: tags ride as one canonical compact-JSON string column
(``canonical_tags``: sorted keys, no whitespace), and the filter is a
VECTORIZED ``map_batches`` — one ``pc.extract_regex`` per requested key
against the canonical encoding, no per-row ``json.loads`` in the hot
path. Works for string / int / bool / null tag values.
"""

from __future__ import annotations

import json
import re
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

_KEY_RE = re.compile(r'^[A-Za-z0-9_\-]+$')


def canonical_tags(tags: dict[str, Any]) -> str:
    """Compact canonical JSON for a tags dict (sorted keys).

    Tag values are SCALARS ONLY (str / finite number / bool / None) —
    enforced here, at the single write path, so the vectorized regex
    filter is total over everything that can actually be stored
    (nested arrays/objects would hijack the per-key extraction, and
    inf/nan are not even valid JSON)."""
    for k, v in tags.items():
        if v is not None and not isinstance(v, (str, int, float, bool)):
            raise TypeError(f"tag {k!r}: unsupported value type {type(v).__name__}")
        if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
            raise ValueError(f"tag {k!r}: non-finite numbers are not valid JSON")
    return json.dumps(tags, sort_keys=True, separators=(",", ":"))


def _value_literals(value: Any) -> list[str]:
    """Every canonical-JSON encoding a tag value EQUAL to ``value`` can
    have under Python ``==`` (the reference compares with ``!=``, where
    ``1 == True == 1.0``), so the vectorized literal comparison matches
    ``filter_documents_by_tags`` exactly. Equal Python numbers always
    ``json.dumps`` to one string per type (int vs float), so the set is
    at most {int-form, float-form, true/false}. NaN never equals
    anything -> empty set."""
    if value is not None and not isinstance(value, (str, int, float, bool)):
        # non-scalar filter values cannot exist in canonical tags
        # (enforced at canonical_tags) — reject loudly, never silently
        raise ValueError(f"unsupported tag filter value type: {type(value).__name__}")
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        if value != value:  # NaN equals nothing
            return []
        if isinstance(value, float) and value in (float("inf"), float("-inf")):
            return []  # non-finite cannot be stored (canonical_tags) -> no match
    outs = {json.dumps(value, separators=(",", ":"))}
    if isinstance(value, (bool, int, float)):
        try:
            if value == int(value):
                outs.add(json.dumps(int(value)))
                if int(value) == 1:
                    outs.add("true")
                elif int(value) == 0:
                    outs.add("false")
            # only a float form that is Python-EQUAL to the filter value:
            # float(2**53+1) rounds to 2**53, and 2**53.0 != 2**53+1, so
            # adding the lossy encoding would match documents the
            # reference's != comparison rejects
            if float(value) == value:
                outs.add(json.dumps(float(value)))
                if value == 0:  # 0.0 and -0.0 are equal but encode apart
                    outs.update(("0.0", "-0.0"))
        except (OverflowError, ValueError):
            pass
    return sorted(outs)


def _key_pattern(key: str) -> str:
    if not _KEY_RE.match(key):
        raise ValueError(f"unsupported tag key for vectorized filter: {key!r}")
    # value = string (no escapes in our canonical tags) | number (incl.
    # exponent form, e.g. json.dumps(1e-07) -> "1e-07") | bool | null
    return (
        f'"{key}":(?P<v>"(?:[^"\\\\]|\\\\.)*"'
        r"|-?[0-9.]+(?:[eE][+-]?[0-9]+)?|true|false|null)"
    )


def filter_by_tags(ds, filter_tags: dict[str, Any], tags_col: str = "tags",
                   ignore_missing_tags: bool = False):
    """Dataset filter with the reference's per-key semantics."""
    patterns = {k: _key_pattern(k) for k in filter_tags}
    literals = {k: _value_literals(v) for k, v in filter_tags.items()}

    def f(batch: pa.Table) -> pa.Table:
        if len(batch) == 0 or not filter_tags:
            return batch
        col = pc.cast(batch[tags_col], pa.string())
        keep = pa.array([True] * len(batch), pa.bool_())
        for key, pat in patterns.items():
            extracted = pc.extract_regex(col, pat)
            present = pc.is_valid(extracted)
            value = pc.struct_field(extracted, "v")
            lits = literals[key]
            if lits:
                matches = pc.is_in(value, value_set=pa.array(lits, pa.string()))
            else:  # NaN filter value: equals nothing
                matches = pa.array([False] * len(batch), pa.bool_())
            # null (key absent) -> missing-tag policy
            ok_present = pc.and_kleene(present, matches)
            if ignore_missing_tags:
                ok = pc.or_kleene(ok_present, pc.invert(present))
            else:
                ok = ok_present
            keep = pc.and_kleene(keep, pc.fill_null(ok, False))
        return batch.filter(pc.fill_null(keep, False))

    return ds.map_batches(f, batch_format="pyarrow")


def filter_table_by_tags(table: pa.Table, filter_tags: dict[str, Any],
                         tags_col: str = "tags",
                         ignore_missing_tags: bool = False) -> pa.Table:
    """Arrow-table variant (driver-side sidecar reads)."""
    rows = []
    for i, s in enumerate(table[tags_col].to_pylist()):
        tags = json.loads(s) if s else {}
        include = True
        for k, v in filter_tags.items():
            if k not in tags and not ignore_missing_tags:
                include = False
            elif k in tags and tags[k] != v:
                include = False
            if not include:
                break
        if include:
            rows.append(i)
    return table.take(rows)
