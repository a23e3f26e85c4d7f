"""Determinism invariants (SURVEY.md §5.1 item 4): output must not
depend on partitioning; fixture regeneration is byte-identical."""

from tabular_data_semantics_py_spark.fixtures.generator import make_corpus
from tabular_data_semantics_py_spark.operators.candidates import (
    generate_candidates,
)


def test_corpus_regeneration_identical(corpus):
    c2 = make_corpus()
    assert c2.repos == corpus.repos
    assert [(e.uri, e.label, e.popularity) for e in c2.entities] == [
        (e.uri, e.label, e.popularity) for e in corpus.entities
    ]
    assert c2.triples == corpus.triples


def test_candidates_partition_invariant(spark, dfs, pipeline):
    """Same candidate set at 2 and 16 partitions (emission determinism
    across partition counts, SURVEY.md §5.1)."""
    data = pipeline.stages["cells"].where("row >= 0")

    def run(n):
        _, cand = generate_candidates(
            data.repartition(n), dfs["entity_index"]
        )
        return {
            (r.mention_norm, r.uri, round(r.score, 12), r.cand_rank)
            for r in cand.collect()
        }

    assert run(2) == run(16)
