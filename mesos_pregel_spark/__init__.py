"""mesos_pregel_spark — a from-scratch PySpark-native link-graph engine.

Re-implements the *capabilities* of the Pregel model (Malewicz et al.,
SIGMOD 2010) as realized by bcrusu/mesos-pregel — vertex-centric BSP
with combiners, aggregators, vote-to-halt and checkpointing — but
expressed Spark-first: every superstep is a DataFrame join + partial
aggregation, vertex updates are column expressions or Arrow-batched
pandas UDFs over CSR-packed partitions, and fault tolerance is
checkpointed vertex-state tables.  No RDDs, no per-row Python.

NOTE on citations: /root/reference was empty at build time (see
SURVEY.md §0); semantic ground truth is the Pregel paper [P] and
BASELINE.json [B].
"""

from mesos_pregel_spark.session import get_spark
from mesos_pregel_spark.functions.edges import (
    build_edges,
    build_edges_generic,
    edges_with_ids,
    symmetrize,
    vertex_names,
)
from mesos_pregel_spark.plans.pregel import PregelRun
from mesos_pregel_spark.plans.program import VertexProgram, pregel
from mesos_pregel_spark.algos.pagerank import pagerank
from mesos_pregel_spark.algos.ppr import personalized_pagerank
from mesos_pregel_spark.algos.cc import (
    connected_components,
    connected_components_jump,
)
from mesos_pregel_spark.algos.lpa import label_propagation
from mesos_pregel_spark.algos.triangles import triangle_count
from mesos_pregel_spark.algos.hits import hits
from mesos_pregel_spark.algos.kcore import k_core
from mesos_pregel_spark.algos.msbfs import multi_source_bfs
from mesos_pregel_spark.algos.landmarks import landmark_distances
from mesos_pregel_spark.algos.scc import strongly_connected_components
from mesos_pregel_spark.algos.ktruss import k_truss
from mesos_pregel_spark.algos.eigenvector import eigenvector
from mesos_pregel_spark.algos.sweep import sweep_cut
from mesos_pregel_spark.algos.wl import wl_colors
from mesos_pregel_spark.functions.pipeline import clean_corpus
from mesos_pregel_spark.functions.composition import textrank
from mesos_pregel_spark.functions.sessions import turn_entropy
from mesos_pregel_spark.functions.dedup import (
    exact_duplicates,
    lsh_candidates,
    near_duplicates,
    simhash,
)
from mesos_pregel_spark.functions.similarity import (
    ann_lsh_topk,
    cosine_scores,
    cosine_topk,
    embedding_near_dups,
    ivf_topk,
)
from mesos_pregel_spark.functions.text import (
    bm25_topk,
    fingerprint,
    language_id,
    quality_score,
    token_stats,
)
from mesos_pregel_spark.functions.decontam import ngram_novelty
from mesos_pregel_spark.algos.structure import (
    attribute_assortativity,
    partition_cut,
)
from mesos_pregel_spark.algos.coarsen import coarsen_graph
from mesos_pregel_spark.algos.trustrank import spam_mass

__all__ = [
    "get_spark",
    "build_edges",
    "build_edges_generic",
    "edges_with_ids",
    "symmetrize",
    "vertex_names",
    "PregelRun",
    "VertexProgram",
    "pregel",
    "pagerank",
    "personalized_pagerank",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "exact_duplicates",
    "lsh_candidates",
    "near_duplicates",
    "simhash",
    "ann_lsh_topk",
    "ivf_topk",
    "embedding_near_dups",
    "cosine_scores",
    "cosine_topk",
    "fingerprint",
    "language_id",
    "quality_score",
    "token_stats",
    "eigenvector",
    "sweep_cut",
    "wl_colors",
    "textrank",
    "turn_entropy",
    "bm25_topk",
    "ngram_novelty",
    "attribute_assortativity",
    "partition_cut",
    "coarsen_graph",
    "spam_mass",
]

__version__ = "0.1.0"
