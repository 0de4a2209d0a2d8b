"""Python UDTF surface (SURVEY.md §2.11: the reference has no table
functions; this is the engine's native table-function API for extensions).

``ngrams_udtf`` is the canonical text-pipeline UDTF: one document row in,
one row per n-gram out. Spark's arrow-optimized Python UDTF streams batches
through the worker; the expansion is partition-local (no shuffle until the
consumer aggregates). For JVM-only fan-out prefer explode(transform(...)) —
a UDTF earns its Python hop when per-row logic needs real code (parsers,
tokenizers, samplers).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="doc_id: bigint, pos: int, ngram: string")
class NGrams:
    """Whitespace word n-grams with position. Deterministic, pure."""

    def __init__(self):
        self._n = 2  # bigrams; subclass or re-register to change order

    def eval(self, doc_id: int, text: str):
        if text is None:
            return
        toks = [t for t in text.lower().split() if t]
        n = self._n
        for i in range(len(toks) - n + 1):
            yield doc_id, i, " ".join(toks[i : i + n])
