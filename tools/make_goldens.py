#!/usr/bin/env python3
"""Generate golden top-k fixtures (FIXTURES.md §5) from the parity kernel.

Run once; outputs are frozen in golden/ and asserted by
tests/test_golden.py. Regenerate only after a deliberate semantic change
(and say so in the commit message).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from infidex_spark.fixtures import (
    MOVIE_QUERIES,
    REFERENCE_DOCS,
    REFERENCE_QUERIES,
    SCHOOL_DOCS,
    SCHOOL_QUERIES,
    movie_docs,
)
from infidex_spark.kernel.engine import KernelIndex


def emit(corpus_name: str, docs, queries) -> None:
    idx = KernelIndex()
    idx.index_documents(docs)
    out_dir = os.path.join(REPO, "golden")
    os.makedirs(out_dir, exist_ok=True)
    for name, text, k in queries:
        hits = idx.search(text, k)
        payload = {
            "corpus": corpus_name,
            "query": text,
            "k": k,
            "results": [
                {"rank": r + 1, "doc_id": d, "bm25_score": s}
                for r, (d, s) in enumerate(hits)
            ],
        }
        path = os.path.join(out_dir, f"{corpus_name}__{name}.json")
        with open(path, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"{path}: {len(hits)} hits, top={hits[0] if hits else None}")


if __name__ == "__main__":
    emit("reference", REFERENCE_DOCS, REFERENCE_QUERIES)
    emit("movies", movie_docs(), MOVIE_QUERIES)
    emit("schools", SCHOOL_DOCS, SCHOOL_QUERIES)
