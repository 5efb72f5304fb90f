import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mesos_pregel_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # Small parallelism keeps per-superstep overhead low on tiny test
    # graphs; correctness must be partition-count-invariant anyway
    # (FIXTURES.md §4.2 — tested explicitly).
    s = get_spark(app_name="pregel-tests", cores=4, shuffle_partitions=8)
    yield s


def id_space(spark, actor_edges_df):
    """Map an actor-keyed edge DF into id space; return (id_edges_df,
    edge list for the oracle, actor->id map)."""
    from mesos_pregel_spark.functions.edges import edges_with_ids, vertex_names

    ids_df = edges_with_ids(actor_edges_df)
    edges = [(r["src"], r["dst"], r["weight"]) for r in ids_df.collect()]
    names = {
        r["name"]: r["id"] for r in vertex_names(actor_edges_df).collect()
    }
    return ids_df, edges, names
