"""Data-quality audit (functions/dq.py): every check class against
planted violations, scalar helpers == composed audit."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from eschergraph_ray.functions.dq import (
    _dup_excess,
    _fk_missing,
    _null_partials,
    _range_partials,
    dq_audit_composed,
    fk_violations,
    null_violations,
    range_violations,
    unique_violations,
)


def _tbl(col, vals, typ=pa.int64()):
    return rd.from_arrow(pa.table({col: pa.array(vals, typ)}))


def test_null_and_range(ray_session):
    ds = _tbl("v", [1.0, None, -3.0, 55.0, 7.0], pa.float64())
    assert null_violations(ds, "v") == 1
    assert range_violations(ds, "v", 0.0, 50.0) == 2  # -3 and 55


def test_unique_counts_excess_rows(ray_session):
    ds = _tbl("k", [1, 1, 1, 2, 3, 3, None])
    # nulls ignored; 3 extra rows beyond the first per key (1x2, 3x1)
    assert unique_violations(ds, "k") == 3
    assert unique_violations(_tbl("k", [1, 2, 3]), "k") == 0


def test_fk_missing_keys(ray_session):
    child = _tbl("c", [1, 1, 2, 5, 9])
    parent = _tbl("p", [1, 2, 3])
    assert fk_violations(child, "c", parent, "p") == 2  # 5 and 9
    assert fk_violations(child, "c", child, "c") == 0


def test_composed_audit_matches_scalars(ray_session):
    vals = _tbl("v", [1.0, None, 99.0], pa.float64())
    keys = _tbl("k", [7, 7, 8])
    child = _tbl("c", [7, 42])
    out = dq_audit_composed(
        [
            _null_partials(vals, "v", "nulls"),
            _range_partials(vals, "v", 0.0, 50.0, "range"),
            _dup_excess(keys, "k", "dups"),
            _fk_missing(child, "c", keys, "k", "fk"),
        ],
        ["nulls", "range", "dups", "fk"],
    ).to_pandas()
    got = dict(zip(out["check_name"], out["n_violations"]))
    assert got == {"nulls": 1, "range": 1, "dups": 1, "fk": 1}
    # all-clean checks still report an explicit 0 row
    clean = dq_audit_composed(
        [_null_partials(keys, "k", "clean")], ["clean"]
    ).to_pandas()
    assert dict(zip(clean["check_name"],
                    clean["n_violations"])) == {"clean": 0}
