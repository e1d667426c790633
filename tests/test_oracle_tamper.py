"""Tamper-proofing for the oracle side-write path (VERDICT r3 #8).

The kg_* DuckDB oracles trust exactly two non-SQL inputs as model
state: the mention-resolution side-write (``_resolution_sidecar``) and
the Louvain membership read from the build's own node parquet. These
tests corrupt one row of each (in a COPY — the shared /tmp cache is
never touched) and assert the oracle output CHANGES, proving the
side-write cannot silently become the thing under test: if the trusted
state were wrong, the driver comparison would fail loudly.
"""

import glob
import os
import shutil
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as E  # noqa: E402


def _sf0001_corpus_glob() -> str:
    from eschergraph_ray.sources.transcripts import GEN_VERSION, sf_to_n_convs

    n = sf_to_n_convs("/root/testdata/sf0.001")
    return f"/tmp/eschergraph_ray/transcripts-v{GEN_VERSION}-n{n}-s{E.SEED}/*.parquet"


def test_kg_triples_oracle_fails_on_tampered_resolution(tmp_path, ray_session):
    out = E._build_for("/root/testdata/sf0.001", "entry")
    res_glob = E._resolution_sidecar(out)
    corpus = _sf0001_corpus_glob()

    con = duckdb.connect()
    true = con.execute(E._kg_triples_sql(corpus, res_glob)).df()
    assert len(true) > 0

    # tamper the canon behind a true triple's subject — EVERY resolution
    # row carrying it in that conversation (a single mention row may be
    # a surface form extraction never fires on, and duckdb's result
    # order makes "the first row" nondeterministic), so no alternate
    # mention path can still produce the original subject
    subj = true.iloc[0]["subj"]
    conv = true.iloc[0]["conv_id"]
    tdir = tmp_path / "res"
    tdir.mkdir()
    tampered_any = False
    for f in sorted(glob.glob(res_glob)):
        t = pq.read_table(f)
        mask = pc.and_(pc.equal(t["conv_id"], conv), pc.equal(t["canon"], subj))
        if pc.any(mask).as_py():
            canon = pa.array(
                [
                    subj + " tampered" if m else c
                    for c, m in zip(t["canon"].to_pylist(), mask.to_pylist())
                ],
                t.schema.field("canon").type,
            )
            t = t.set_column(t.schema.get_field_index("canon"), "canon", canon)
            tampered_any = True
        pq.write_table(t, str(tdir / os.path.basename(f)))
    assert tampered_any

    bad = con.execute(E._kg_triples_sql(corpus, str(tdir / "*.parquet"))).df()
    key = ["conv_id", "subj", "pred", "obj", "chunk_id"]
    assert set(map(tuple, true[key].values)) != set(map(tuple, bad[key].values))


def test_kg_nodes_oracle_fails_on_tampered_membership(tmp_path, ray_session):
    out = E._build_for("/root/testdata/sf0.001", "entry")
    E._resolution_sidecar(out)
    corpus = _sf0001_corpus_glob()

    con = duckdb.connect()
    true = con.execute(E._kg_nodes_sql(corpus, out)).df()
    n_l1 = int((true["level"] == 1).sum())
    assert n_l1 > 0

    # copy the whole build dir and delete ONE level-1 community row
    copy = tmp_path / "build-copy"
    shutil.copytree(out, copy)
    tampered = False
    for f in sorted(glob.glob(str(copy / "graph" / "*" / "kind=node" / "*.parquet"))):
        t = pq.read_table(f)
        lvl = pc.fill_null(pc.equal(t["level"], 1), False)
        if not tampered and pc.any(lvl).as_py():
            hit = lvl.to_pylist().index(True)
            keep = [i != hit for i in range(t.num_rows)]
            pq.write_table(t.filter(pa.array(keep)).combine_chunks(), f)
            tampered = True
    assert tampered

    bad = con.execute(E._kg_nodes_sql(corpus, str(copy))).df()
    assert int((bad["level"] == 1).sum()) != n_l1
