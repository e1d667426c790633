"""Malformed extractions land in lineage as quarantined counts —
the reference prints-and-drops (build_pipeline.py:108-112); we account."""

import shutil

from eschergraph_ray.llm import DeterministicMockLLM
from eschergraph_ray.pipelines.build import build
from eschergraph_ray.sources.transcripts import transcripts_parquet_dir


def test_quarantined_chunks_counted_in_lineage():
    # Defined inside the test so cloudpickle ships it BY VALUE — a
    # module-level class in tests/ is pickled by reference and Ray
    # workers cannot import the test module (actor crash-loop).
    class FlakyLLM(DeterministicMockLLM):
        """Returns malformed output for chunks containing a marker word."""

        def extract_nodes_edges(self, chunk_text: str) -> dict:
            if "deliverables" in chunk_text:  # common filler word
                return {"entities": "garbage", "relationships": []}
            return super().extract_nodes_edges(chunk_text)

    src = transcripts_parquet_dir(12, root="/tmp/eschergraph_ray_test")
    out = "/tmp/eg_t_quar"
    shutil.rmtree(out, ignore_errors=True)
    res = build(src, out, llm_factory=FlakyLLM)
    lin = res.lineage.to_pylist()
    total_q = sum(r["quarantined_count"] for r in lin)
    total_chunks = sum(r["chunk_count"] for r in lin)
    assert total_q > 0, "marker word should have poisoned some chunks"
    assert total_q < total_chunks
    # clean run has zero quarantined
    out2 = "/tmp/eg_t_quar_clean"
    shutil.rmtree(out2, ignore_errors=True)
    res2 = build(src, out2)
    assert sum(r["quarantined_count"] for r in res2.lineage.to_pylist()) == 0
